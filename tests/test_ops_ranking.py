"""The Pallas rank-position kernel (interpret mode on CPU) must agree with
the reference-rule scatter evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acf_tpu.eval import FullRankEvaluator
from acf_tpu.models.caser import Caser
from acf_tpu.models.dream import DREAM
from acf_tpu.models.gru4rec import GRU4Rec
from acf_tpu.models.mf import MFBPR
from acf_tpu.models.sasrec import SASRec
from acf_tpu.ops.ranking import rank_positions_dot
from tests.test_full_rank import make_data


def test_kernel_counts_match_numpy():
    rng = np.random.default_rng(0)
    b, d, I = 16, 8, 300  # deliberately not a multiple of the tile
    u = rng.standard_normal((b, d)).astype(np.float32)
    E = rng.standard_normal((I, d)).astype(np.float32)
    bias = rng.standard_normal(I).astype(np.float32)
    t = rng.standard_normal(b).astype(np.float32)
    gt = rng.integers(1, I, size=b).astype(np.int32)
    got = np.asarray(rank_positions_dot(
        jnp.asarray(u), jnp.asarray(E), jnp.asarray(t), bias=jnp.asarray(bias),
        gt=jnp.asarray(gt), item_tile=128, interpret=True))
    ge = (u @ E.T + bias[None, :]) >= t[:, None]
    ge[:, 0] = False  # pad column excluded
    ge[np.arange(b), gt] = False  # gt column excluded
    np.testing.assert_array_equal(got, ge.sum(1))


def test_kernel_no_bias():
    rng = np.random.default_rng(1)
    u = rng.standard_normal((8, 4)).astype(np.float32)
    E = rng.standard_normal((256, 4)).astype(np.float32)
    t = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(rank_positions_dot(
        jnp.asarray(u), jnp.asarray(E), jnp.asarray(t), item_tile=128,
        interpret=True))
    ge = (u @ E.T) >= t[:, None]
    ge[:, 0] = False  # pad column excluded by default
    np.testing.assert_array_equal(got, ge.sum(1))


MODELS = {
    "mfbpr": lambda d: MFBPR(d.num_users, d.num_items, 8),
    "sasrec": lambda d: SASRec(d.num_users, d.num_items, 8, maxlen=6),
    "gru4rec": lambda d: GRU4Rec(d.num_users, d.num_items, 8, maxlen=6),
    "dream": lambda d: DREAM(d.num_users, d.num_items, 8, maxlen=6),
    "caser": lambda d: Caser(d.num_users, d.num_items, 8, maxlen=4,
                             n_h=2, n_v=2),
}


@pytest.mark.parametrize("name", list(MODELS))
def test_factored_positions_match_reference_path(name):
    data = make_data(num_users=20, num_items=50, seed=2)
    model = MODELS[name](data)
    params = model.init_params(jax.random.PRNGKey(3))
    ev = FullRankEvaluator(data, batch_users=8,
                           eval_hist_len=getattr(model, "maxlen", None))
    ref = ev.positions(model.score_all, params)
    fs = model.factored_scorer()
    assert fs is not None
    fast = ev.positions_factored(fs[0], fs[1], params, interpret=True)
    np.testing.assert_array_equal(fast, ref)


def test_factored_evaluate_model_dispatch():
    data = make_data(seed=5)
    model = MFBPR(data.num_users, data.num_items, 8)
    params = model.init_params(jax.random.PRNGKey(0))
    ev = FullRankEvaluator(data, batch_users=8)
    a = ev.evaluate_model(model, params)
    b = ev.evaluate(model.score_all, params)
    np.testing.assert_allclose(a.hr, b.hr)
    np.testing.assert_allclose(a.auc, b.auc, rtol=1e-6)
