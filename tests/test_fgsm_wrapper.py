"""Generic FGSM/PGD wrapper (acf_tpu/adversarial/fgsm.py) across the zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from acf_tpu.adversarial import FGSMAdversarial
from acf_tpu.models import DREAM, DRCF, GRU4Rec, MFBPR, NeuMF, Caser
from acf_tpu.train import Trainer, TrainConfig
from tests.test_trainer import synthetic_data


def test_leaf_autodetect():
    data = synthetic_data(seed=20)
    U, I = data.num_users, data.num_items
    base = GRU4Rec(U, I, 8, maxlen=5)
    w = FGSMAdversarial(U, I, 8, base=base)
    params = w.init_params(jax.random.PRNGKey(0))
    assert set(w._leaf_names(params)) == {"emb", "W"}
    base_c = Caser(U, I, 8, maxlen=5)
    wc = FGSMAdversarial(U, I, 8, base=base_c)
    pc = wc.init_params(jax.random.PRNGKey(0))
    assert set(wc._leaf_names(pc)) == {"user_emb", "item_emb", "W2"}


def test_matches_apr_on_mfbpr():
    """Wrapping clean MFBPR reproduces the built-in APR objective exactly
    (same FGSM recipe, same reg_adv composition) when reg=0."""
    data = synthetic_data(seed=21)
    U, I = data.num_users, data.num_items
    apr = MFBPR(U, I, 8, adversarial=True, eps=0.5, reg_adv=1.0)
    wrap = FGSMAdversarial(U, I, 8, base=MFBPR(U, I, 8), eps=0.5, reg_adv=1.0)
    params = apr.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.integers(1, U, 16, dtype=np.int32)),
             jnp.asarray(rng.integers(1, I, 16, dtype=np.int32)),
             jnp.asarray(rng.integers(1, I, 16, dtype=np.int32)))
    key = jax.random.PRNGKey(1)
    la, _ = apr.loss(params, batch, key)
    lw, _ = wrap.loss(params, batch, key)
    np.testing.assert_allclose(float(la), float(lw), rtol=1e-6)


def test_linearizes_on_unregularized_loss():
    """With reg != 0 the wrapper's deltas must still match built-in APR's:
    both linearize FGSM on the RAW BPR loss, not the regularized objective
    (evaluation_adv.py:162 vs 192-203)."""
    data = synthetic_data(seed=23)
    U, I = data.num_users, data.num_items
    apr = MFBPR(U, I, 8, adversarial=True, eps=0.5, reg=0.05)
    wrap = FGSMAdversarial(U, I, 8, base=MFBPR(U, I, 8, reg=0.05), eps=0.5)
    params = apr.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(1, U, 16, dtype=np.int32))
    pos = jnp.asarray(rng.integers(1, I, 16, dtype=np.int32))
    neg = jnp.asarray(rng.integers(1, I, 16, dtype=np.int32))
    key = jax.random.PRNGKey(1)
    dP, dQ = apr.fgsm_deltas(params, users, pos, neg, key)
    dw = wrap.deltas(params, (users, pos, neg), key)
    np.testing.assert_allclose(np.asarray(dP), np.asarray(dw["P"]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(dw["Q"]), atol=1e-7)


@pytest.mark.parametrize("cls,kw", [
    (GRU4Rec, {"maxlen": 5}), (DREAM, {"maxlen": 5}), (NeuMF, {}),
    (DRCF, {"maxlen": 5}), (Caser, {"maxlen": 5}),
])
def test_wrapper_trains(cls, kw):
    data = synthetic_data(seed=22)
    U, I = data.num_users, data.num_items
    base = cls(U, I, 8, **kw)
    w = FGSMAdversarial(U, I, 8, base=base, eps=0.1, adv_steps=2)
    tr = Trainer(w, data, optax.adam(1e-3),
                 TrainConfig(batch_size=32, verbose=10**9))
    s = tr.run_epoch()
    assert np.isfinite(s["loss"]) and np.isfinite(s["loss_adv"])
    res = tr.evaluate().at_k(10)
    assert np.isfinite(res[1])
