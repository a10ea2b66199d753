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


def test_async_snapshotter_context_manager(tmp_path):
    tree = {"x": np.full(3, 7.0, np.float32)}
    with AsyncSnapshotter() as snap:
        snap.save(str(tmp_path / "cm"), tree)
    out = load_params(str(tmp_path / "cm"), tree)
    _trees_equal(tree, out)
