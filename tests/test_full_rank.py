import jax
import numpy as np
import pandas as pd

from acf_tpu.data import interactions_from_frame
from acf_tpu.eval import FullRankEvaluator
from acf_tpu.models.mf import MFBPR


def make_data(num_users=12, num_items=30, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    t = 0
    for u in range(1, num_users):
        n = rng.integers(3, 10)
        items = rng.choice(np.arange(1, num_items), size=n, replace=True)
        for i in items:
            rows.append((u, int(i), t))
            t += 1
    df = pd.DataFrame(rows, columns=["uid", "iid", "timestamp"])
    return interactions_from_frame(df, reindex=False)


def oracle_positions(data, P, Q):
    """Literal reference candidate rule + rank position
    (evaluation_adv.py:425-437, 463-473)."""
    out = {}
    for u in data.eval_users():
        gt = int(data.test_item[u])
        train = set(int(x) for x in data.hist[u] if x != 0)
        cands = set(range(data.num_items)) - train
        cands.discard(gt)
        cands.discard(0)
        pos_score = float(P[u] @ Q[gt])
        neg_scores = np.array([float(P[u] @ Q[j]) for j in sorted(cands)])
        out[int(u)] = (int((neg_scores >= pos_score).sum()), len(cands))
    return out


def test_positions_match_oracle():
    data = make_data()
    model = MFBPR(data.num_users, data.num_items, 8)
    params = model.init_params(jax.random.PRNGKey(7))
    P = np.asarray(params["P"])
    Q = np.asarray(params["Q"])

    ev = FullRankEvaluator(data, batch_users=5)
    pos = ev.positions(model.score_all, params)
    oracle = oracle_positions(data, P, Q)
    users = data.eval_users()
    for idx, u in enumerate(users):
        opos, ocand = oracle[int(u)]
        assert pos[idx] == opos, (u, pos[idx], opos)
        assert data.num_eval_candidates()[u] == ocand


def test_evaluate_ranges():
    data = make_data(seed=3)
    model = MFBPR(data.num_users, data.num_items, 8)
    params = model.init_params(jax.random.PRNGKey(0))
    res = FullRankEvaluator(data, batch_users=4).evaluate(model.score_all, params)
    hr, ndcg, auc = res.at_k(10)
    assert 0.0 <= hr <= 1.0 and 0.0 <= ndcg <= 1.0 and 0.0 <= auc <= 1.0
    # HR@K is monotone in K
    means = res.hr.mean(0)
    assert (np.diff(means) >= -1e-7).all()


def test_sampled_positions():
    data = make_data(seed=5)
    # attach sampled negatives
    rng = np.random.default_rng(0)
    negs = np.zeros((data.num_users, 20), dtype=np.int32)
    for u in data.eval_users():
        train = set(int(x) for x in data.hist[u] if x != 0) | {int(data.test_item[u]), 0}
        pool = [i for i in range(data.num_items) if i not in train]
        negs[u] = rng.choice(pool, size=20, replace=True)
    data.test_negatives = negs

    model = MFBPR(data.num_users, data.num_items, 8)
    params = model.init_params(jax.random.PRNGKey(2))
    P, Q = np.asarray(params["P"]), np.asarray(params["Q"])
    ev = FullRankEvaluator(data, batch_users=4)
    pos = ev.positions_sampled(model.score_some, params)
    for idx, u in enumerate(data.eval_users()):
        gt = int(data.test_item[u])
        ns = np.array([float(P[u] @ Q[j]) for j in negs[u]])
        expect = int((ns >= float(P[u] @ Q[gt])).sum())
        assert pos[idx] == expect


def test_factored_path_matches_full_path_sasrec():
    """The Pallas/factored path and the score_all path must agree on rank
    positions for the same params (CPU interpret mode, f32 exact)."""
    import optax

    from acf_tpu.models.sasrec import SASRec
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=11)
    model = SASRec(data.num_users, data.num_items, 8, maxlen=4, num_blocks=1)
    tr = Trainer(model, data, optax.adam(1e-3), TrainConfig(batch_size=32))
    tr.run_epoch()
    ev = tr.evaluator
    fs = model.factored_scorer()
    pos_f = ev.positions_factored(fs[0], fs[1], tr.params)
    pos_a = ev.positions(model.score_all, tr.params)
    np.testing.assert_array_equal(pos_f, pos_a)
