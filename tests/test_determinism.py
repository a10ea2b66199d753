"""Determinism + full-state resume (SURVEY.md §4 test strategy)."""

import numpy as np
import optax

from acf_tpu.models.mf import MFBPR
from acf_tpu.models.sasrec import SASRec
from acf_tpu.train import Trainer, TrainConfig
from tests.test_trainer import synthetic_data
from tests.test_sasrec import seq_data


def test_same_seed_same_trajectory():
    data = synthetic_data(seed=31)
    runs = []
    for _ in range(2):
        tr = Trainer(MFBPR(data.num_users, data.num_items, 8), data,
                     optax.adagrad(0.1), TrainConfig(batch_size=32, seed=7))
        for _ in range(3):
            tr.run_epoch()
        runs.append(np.asarray(tr.params["P"]))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_different_seed_different_trajectory():
    data = synthetic_data(seed=31)
    ps = []
    for seed in (1, 2):
        tr = Trainer(MFBPR(data.num_users, data.num_items, 8), data,
                     optax.adagrad(0.1),
                     TrainConfig(batch_size=32, seed=seed))
        tr.run_epoch()
        ps.append(np.asarray(tr.params["P"]))
    assert np.abs(ps[0] - ps[1]).max() > 0


def test_seq_model_deterministic():
    data = seq_data()
    runs = []
    for _ in range(2):
        tr = Trainer(SASRec(data.num_users, data.num_items, 8, maxlen=6,
                            dropout_rate=0.5),
                     data, optax.adam(1e-3), TrainConfig(batch_size=16, seed=3))
        tr.run_epoch()
        runs.append(np.asarray(tr.params["item_emb"]))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_checkpoint_resume_bit_exact(tmp_path):
    data = synthetic_data(seed=32)

    def make():
        return Trainer(MFBPR(data.num_users, data.num_items, 8), data,
                       optax.adagrad(0.1), TrainConfig(batch_size=32, seed=9))

    # run 4 epochs straight
    a = make()
    for _ in range(4):
        a.run_epoch()

    # run 2, checkpoint, restore into a fresh trainer, run 2 more
    b = make()
    for _ in range(2):
        b.run_epoch()
    path = str(tmp_path / "state")
    b.save_checkpoint(path)
    c = make()
    c.restore_checkpoint(path)
    for _ in range(2):
        c.run_epoch()

    np.testing.assert_array_equal(np.asarray(a.params["P"]),
                                  np.asarray(c.params["P"]))
    np.testing.assert_array_equal(np.asarray(a.params["Q"]),
                                  np.asarray(c.params["Q"]))
