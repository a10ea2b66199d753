"""Sparse APR step vs the dense optax path: identical trajectories."""

import numpy as np
import optax
import pytest

from acf_tpu.models.mf import MFBPR
from acf_tpu.ops.sparse_step import SparseMFBPR
from acf_tpu.train import Trainer, TrainConfig
from tests.test_trainer import synthetic_data


@pytest.mark.parametrize("dedup", ["sort", "matmul"])
@pytest.mark.parametrize("adversarial", [False, True])
def test_sparse_matches_dense_epoch(adversarial, dedup):
    data = synthetic_data(seed=41)
    kw = dict(reg=0.01, adversarial=adversarial, eps=0.5, reg_adv=1.0)
    dense = MFBPR(data.num_users, data.num_items, 8, **kw)
    sparse = SparseMFBPR(data.num_users, data.num_items, 8, lr=0.05,
                         dedup=dedup, **kw)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)

    td = Trainer(dense, data, opt, TrainConfig(batch_size=32, seed=5))
    ts = Trainer(sparse, data, opt, TrainConfig(batch_size=32, seed=5))
    np.testing.assert_array_equal(np.asarray(td.params["P"]),
                                  np.asarray(ts.params["P"]))
    for _ in range(3):
        sd = td.run_epoch()
        ss = ts.run_epoch()
    np.testing.assert_allclose(np.asarray(td.params["P"]),
                               np.asarray(ts.params["P"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(td.params["Q"]),
                               np.asarray(ts.params["Q"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(sd["loss"], ss["loss"], rtol=1e-3)


def test_sparse_untouched_rows_stay_put():
    data = synthetic_data(seed=42)
    sparse = SparseMFBPR(data.num_users, data.num_items, 8, adversarial=True)
    tr = Trainer(sparse, data, optax.adagrad(0.05),
                 TrainConfig(batch_size=32, seed=1))
    p0 = np.asarray(tr.params["P"]).copy()
    acc0 = np.asarray(tr.opt_state["accP"]).copy()
    tr.run_epoch()
    # row 0 (pad) is never a real id → must be bit-identical
    np.testing.assert_array_equal(np.asarray(tr.params["P"])[0], p0[0])
    np.testing.assert_array_equal(np.asarray(tr.opt_state["accP"])[0], acc0[0])
