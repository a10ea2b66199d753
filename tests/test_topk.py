import jax
import jax.numpy as jnp
import numpy as np

from acf_tpu.models.mf import MFBPR
from acf_tpu.models.neumf import NeuMF
from acf_tpu.ops.topk import recommend, topk_factored
from tests.test_full_rank import make_data


def test_topk_factored_matches_naive():
    rng = np.random.default_rng(0)
    b, d, I = 8, 8, 300
    u = rng.standard_normal((b, d)).astype(np.float32)
    E = rng.standard_normal((I, d)).astype(np.float32)
    bias = rng.standard_normal(I).astype(np.float32)
    hists = np.zeros((b, 5), np.int32)
    for i in range(b):
        hists[i] = rng.choice(np.arange(1, I), 5, replace=False)
    s, it = topk_factored(jnp.asarray(u), jnp.asarray(E), jnp.asarray(hists),
                          bias=jnp.asarray(bias), k=7, item_tile=128)
    s, it = np.asarray(s), np.asarray(it)
    scores = u @ E.T + bias[None]
    scores[:, 0] = -np.inf
    for i in range(b):
        scores[i, hists[i]] = -np.inf
        order = np.argsort(-scores[i])[:7]
        np.testing.assert_array_equal(it[i], order)
        np.testing.assert_allclose(s[i], scores[i][order], rtol=1e-5)


def test_recommend_excludes_train_items():
    data = make_data(seed=9)
    for model in (MFBPR(data.num_users, data.num_items, 8),
                  NeuMF(data.num_users, data.num_items, 8)):
        params = model.init_params(jax.random.PRNGKey(1))
        users = data.eval_users()[:6]
        sc, it = recommend(model, params, data, users, k=5)
        assert it.shape == (6, 5)
        for row, u in enumerate(users):
            train = set(int(x) for x in data.hist[u] if x)
            for item in it[row]:
                assert item not in train
                assert item != 0


def test_recommend_bulk_matches_per_batch():
    """>=4 batches routes through the single-dispatch lax.map bulk program;
    it must return exactly the per-batch path's results, including the
    ragged final batch and for a sequence model (history gather on device)."""
    from acf_tpu.models.sasrec import SASRec

    data = make_data(seed=11)
    users = data.eval_users()[:11]  # batch_users=2 -> 6 batches, last ragged
    for model in (MFBPR(data.num_users, data.num_items, 8),
                  SASRec(data.num_users, data.num_items, 8, maxlen=4)):
        params = model.init_params(jax.random.PRNGKey(3))
        s_bulk, i_bulk = recommend(model, params, data, users, k=5,
                                   batch_users=2)
        s_one, i_one = recommend(model, params, data, users, k=5,
                                 batch_users=len(users))  # 1 batch: per-batch
        np.testing.assert_array_equal(i_bulk, i_one)
        np.testing.assert_allclose(s_bulk, s_one, rtol=1e-5)
        assert i_bulk.shape == (11, 5)


def test_recommend_factored_matches_score_all_path():
    """The factored (tiled top-K) and score_all branches of recommend() must
    return identical items for a dot-factored model."""
    data = make_data(seed=10)
    model = MFBPR(data.num_users, data.num_items, 8)
    params = model.init_params(jax.random.PRNGKey(2))
    users = data.eval_users()[:8]
    s1, i1 = recommend(model, params, data, users, k=5)

    class NoFactored:
        num_items = model.num_items
        score_all = staticmethod(model.score_all)
        def factored_scorer(self):
            return None

    s2, i2 = recommend(NoFactored(), params, data, users, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
