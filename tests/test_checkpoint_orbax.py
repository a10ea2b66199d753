"""Orbax checkpoint backend: full-train-state roundtrip, auto-detection,
async periodic snapshots. The npz backend is covered by
tests/test_trainer.py::test_checkpoint_roundtrip; this backend adds
sharding-aware directory checkpoints + IO that overlaps training
(SURVEY.md §7.1 step 5 names orbax for periodic checkpoints)."""

import jax
import numpy as np
import optax

from acf_tpu.models.mf import MFBPR
from acf_tpu.train import Trainer, TrainConfig
from acf_tpu.train.checkpoint import AsyncSnapshotter, load_params, save_params

from test_trainer import synthetic_data


def _trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_and_resume(tmp_path):
    data = synthetic_data(seed=4)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)

    def mk():
        m = MFBPR(data.num_users, data.num_items, 8, adversarial=True,
                  eps=0.5, reg_adv=1.0)
        return Trainer(m, data, opt,
                       TrainConfig(batch_size=32, verbose=10 ** 9,
                                   ckpt_backend="orbax"))

    a = mk()
    a.run_epoch()
    ck = str(tmp_path / "state")
    a.save_checkpoint(ck)

    # load_params auto-detects the directory format
    like = {"params": a.params, "opt": a.opt_state, "key": a.key}
    state = load_params(ck, like)
    _trees_equal(state["params"], a.params)

    # bit-exact resume: restored trainer continues identically
    b = mk()
    b.restore_checkpoint(ck)
    for _ in range(2):
        a.run_epoch()
        b.run_epoch()
    _trees_equal(a.params, b.params)
    _trees_equal(a.opt_state, b.opt_state)


def test_orbax_save_params_plain_tree(tmp_path):
    tree = {"P": np.arange(6.0, dtype=np.float32).reshape(2, 3),
            "nested": {"h": np.ones(4, np.float32)}}
    p = str(tmp_path / "plain")
    save_params(p, tree, backend="orbax")
    out = load_params(p, tree)  # auto-detect
    _trees_equal(tree, out)


def test_async_snapshotter_overlapped_saves(tmp_path):
    data = synthetic_data(seed=5)
    opt = optax.adagrad(0.05)
    m = MFBPR(data.num_users, data.num_items, 8)
    tr = Trainer(m, data, opt,
                 TrainConfig(batch_size=32, verbose=10 ** 9,
                             ckpt_backend="orbax"))
    tr.run_epoch()
    # non-blocking save, then keep training while IO completes
    tr.save_checkpoint(str(tmp_path / "snap"), blocking=False)
    saved_params = jax.device_get(tr.params)
    tr.run_epoch()
    tr._snapshotter.wait()
    like = {"params": tr.params, "opt": tr.opt_state, "key": tr.key}
    state = load_params(str(tmp_path / "snap"), like)
    # the snapshot holds the state at save time, not the mutated one
    _trees_equal(state["params"], saved_params)


def test_fit_periodic_orbax_snapshots(tmp_path):
    data = synthetic_data(seed=6)
    opt = optax.adagrad(0.05)
    m = MFBPR(data.num_users, data.num_items, 8)
    cfg = TrainConfig(batch_size=32, epochs=4, verbose=10 ** 9,
                      ckpt_every=2, ckpt_path=str(tmp_path / "ck"),
                      ckpt_backend="orbax")
    tr = Trainer(m, data, opt, cfg)
    tr.fit()
    assert (tmp_path / "ck-0").is_dir()
    assert (tmp_path / "ck-2").is_dir()


def _mesh_trainer(data, opt, mesh):
    m = MFBPR(data.num_users, data.num_items, 8, adversarial=True,
              eps=0.5, reg_adv=1.0)
    return Trainer(m, data, opt,
                   TrainConfig(batch_size=32, verbose=10 ** 9,
                               ckpt_backend="orbax", mesh=mesh,
                               shard_min_rows=1))


def test_orbax_mesh_roundtrip_cross_topology(tmp_path):
    """The checkpoint.py sharding claims, test-locked (VERDICT r3 #3): a
    train state whose tables are genuinely row-sharded over an 8-device
    (2 data × 4 model) mesh saves through the orbax backend and restores
    bit-exactly onto (a) the same mesh, (b) a single device, (c) a 4-device
    (2×2) mesh — per-user eval metrics identical each way, and the same-mesh
    restore continues training bit-exactly."""
    from jax.sharding import PartitionSpec as P

    from acf_tpu.parallel.mesh import make_mesh

    data = synthetic_data(seed=7)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)
    mesh8 = make_mesh(num_data=2, num_model=4, devices=jax.devices()[:8])

    a = _mesh_trainer(data, opt, mesh8)
    a.run_epoch()
    # precondition: the state being saved really is sharded, not silently
    # replicated — P (60 users, 60 % 4 == 0) row-sharded, Q (37 items, not
    # divisible by 4) through the Megatron-style column fallback, so the
    # round-trip covers BOTH layouts
    assert a.params["P"].sharding.spec == P("model", None)
    assert a.params["Q"].sharding.spec == P(None, "model")
    ck = str(tmp_path / "mesh_state")
    a.save_checkpoint(ck)
    ref = a.evaluate()

    # (a) same mesh: params + opt slots bit-exact, training continues
    # bit-exactly
    b = _mesh_trainer(data, opt, mesh8)
    b.restore_checkpoint(ck)
    assert b.params["P"].sharding.spec == P("model", None)
    _trees_equal(a.params, b.params)
    _trees_equal(a.opt_state, b.opt_state)
    a.run_epoch()
    b.run_epoch()
    _trees_equal(a.params, b.params)

    # (b) 8-device save → single-device restore
    c = _mesh_trainer(data, opt, None)
    c.restore_checkpoint(ck)
    res_c = c.evaluate()
    assert np.array_equal(ref.hr, res_c.hr)
    assert np.array_equal(ref.ndcg, res_c.ndcg)

    # (c) 8-device save → 4-device (2×2) mesh restore
    mesh4 = make_mesh(num_data=2, num_model=2, devices=jax.devices()[:4])
    d = _mesh_trainer(data, opt, mesh4)
    d.restore_checkpoint(ck)
    assert d.params["P"].sharding.spec == P("model", None)
    assert d.params["P"].sharding.mesh.shape["model"] == 2
    res_d = d.evaluate()
    assert np.array_equal(ref.hr, res_d.hr)
    assert np.array_equal(ref.ndcg, res_d.ndcg)


def test_orbax_single_device_save_restores_onto_mesh(tmp_path):
    """The reverse topology change: a single-device orbax snapshot restores
    onto an 8-device mesh with the mesh trainer's own (row-sharded)
    placement, and evaluates identically."""
    from jax.sharding import PartitionSpec as P

    from acf_tpu.parallel.mesh import make_mesh

    data = synthetic_data(seed=8)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)
    a = _mesh_trainer(data, opt, None)
    a.run_epoch()
    ck = str(tmp_path / "flat_state")
    a.save_checkpoint(ck)
    ref = a.evaluate()

    mesh8 = make_mesh(num_data=2, num_model=4, devices=jax.devices()[:8])
    b = _mesh_trainer(data, opt, mesh8)
    b.restore_checkpoint(ck)
    assert b.params["P"].sharding.spec == P("model", None)
    _trees_equal(a.params, b.params)
    res_b = b.evaluate()
    assert np.array_equal(ref.hr, res_b.hr)
    assert np.array_equal(ref.ndcg, res_b.ndcg)


def test_async_snapshotter_context_manager(tmp_path):
    tree = {"x": np.full(3, 7.0, np.float32)}
    with AsyncSnapshotter() as snap:
        snap.save(str(tmp_path / "cm"), tree)
    out = load_params(str(tmp_path / "cm"), tree)
    _trees_equal(tree, out)
