import jax
import jax.numpy as jnp
import numpy as np

from acf_tpu.models.mf import MFBPR, PointwiseMF
from acf_tpu.models.base import row_normalize


def numpy_bpr_loss(P, Q, u, i, j):
    """Oracle for the reference loss (evaluation_adv.py:155-166)."""
    pos = (P[u] * Q[i]).sum(-1)
    neg = (P[u] * Q[j]).sum(-1)
    diff = np.clip(pos - neg, -80.0, 1e8)
    return np.sum(np.log1p(np.exp(-diff)))


def setup(adversarial=False, reg=0.0):
    model = MFBPR(20, 30, 8, reg=reg, adversarial=adversarial, eps=0.5, reg_adv=1.0)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    u = rng.integers(1, 20, size=16)
    i = rng.integers(1, 30, size=16)
    j = rng.integers(1, 30, size=16)
    return model, params, u, i, j


def test_clean_loss_matches_oracle():
    model, params, u, i, j = setup()
    loss, aux = model.loss(params, (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j)),
                           jax.random.PRNGKey(1))
    oracle = numpy_bpr_loss(np.asarray(params["P"]), np.asarray(params["Q"]), u, i, j)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-5)


def test_reg_term():
    model, params, u, i, j = setup(reg=0.1)
    loss, _ = model.loss(params, (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j)),
                         jax.random.PRNGKey(1))
    P, Q = np.asarray(params["P"]), np.asarray(params["Q"])
    reg_term = np.mean(P[u] ** 2 + Q[i] ** 2 + Q[j] ** 2)
    oracle = numpy_bpr_loss(P, Q, u, i, j) + 0.1 * reg_term
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-5)


def test_fgsm_delta_oracle():
    """FGSM delta = eps * row-normalized dense grad of the clean loss
    (evaluation_adv.py:192-203). For MF the grad rows are closed-form:
    dL/dP[u] = -sigma(-(diff)) * (Q[i] - Q[j]) scatter-added over the batch."""
    model, params, u, i, j = setup(adversarial=True)
    P, Q = np.asarray(params["P"]), np.asarray(params["Q"])
    pos = (P[u] * Q[i]).sum(-1)
    neg = (P[u] * Q[j]).sum(-1)
    coeff = -1.0 / (1.0 + np.exp(pos - neg))  # d softplus(-(x)) / dx
    gP = np.zeros_like(P)
    gQ = np.zeros_like(Q)
    for b in range(len(u)):
        gP[u[b]] += coeff[b] * (Q[i[b]] - Q[j[b]])
        gQ[i[b]] += coeff[b] * P[u[b]]
        gQ[j[b]] -= coeff[b] * P[u[b]]

    def rn(x):
        n = np.sqrt((x ** 2).sum(-1, keepdims=True))
        return np.where(n > 1e-12, x / np.maximum(n, 1e-12), 0.0)

    dP, dQ = model.fgsm_deltas(params, jnp.asarray(u), jnp.asarray(i), jnp.asarray(j))
    np.testing.assert_allclose(np.asarray(dP), 0.5 * rn(gP), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dQ), 0.5 * rn(gQ), atol=1e-5)
    # untouched rows have zero delta
    untouched = sorted(set(range(20)) - set(u.tolist()))
    assert np.abs(np.asarray(dP)[untouched]).max() == 0.0


def test_adversarial_loss_composition():
    model, params, u, i, j = setup(adversarial=True)
    batch = (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j))
    loss_adv_total, aux = model.loss(params, batch, jax.random.PRNGKey(1))
    clean = MFBPR(20, 30, 8, adversarial=False)
    loss_clean, _ = clean.loss(params, batch, jax.random.PRNGKey(1))
    # opt = clean + reg_adv * adv  (reg = 0 here)
    np.testing.assert_allclose(
        float(loss_adv_total), float(loss_clean) + float(aux["loss_adv"]), rtol=1e-5)
    # perturbation increases the loss (that's the point of FGSM)
    assert float(aux["loss_adv"]) > float(aux["loss"])


def test_row_normalize_zero_rows():
    x = jnp.asarray(np.array([[0.0, 0.0], [3.0, 4.0]]))
    out = np.asarray(row_normalize(x))
    np.testing.assert_allclose(out[0], [0.0, 0.0])
    np.testing.assert_allclose(out[1], [0.6, 0.8], rtol=1e-6)


def test_pointwise_mf_loss():
    model = PointwiseMF(10, 15, 4)
    params = model.init_params(jax.random.PRNGKey(0))
    u = jnp.asarray([1, 2]); i = jnp.asarray([3, 4]); j = jnp.asarray([5, 6])
    loss, aux = model.loss(params, (u, i, j), jax.random.PRNGKey(0))
    P, Q = np.asarray(params["P"]), np.asarray(params["Q"])
    ps = (P[[1, 2]] * Q[[3, 4]]).sum(-1)
    ns = (P[[1, 2]] * Q[[5, 6]]).sum(-1)
    logits = np.concatenate([ps, ns]); labels = np.array([1, 1, 0, 0.])
    oracle = np.mean(np.logaddexp(0, logits) - labels * logits)
    np.testing.assert_allclose(float(loss), oracle, rtol=1e-5)


def test_row_level_adv_path_matches_table_path():
    """The gather-then-normalize hot path in loss() must produce EXACTLY the
    same adversarial loss as scoring with full fgsm_deltas tables."""
    model, params, u, i, j = setup(adversarial=True)
    batch = (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j))
    key = jax.random.PRNGKey(0)
    total, aux = model.loss(params, batch, key)

    dP, dQ = model.fgsm_deltas(params, *batch)
    pos_a, _, _ = model._pair_scores(params, batch[0], batch[1], dP, dQ)
    neg_a, _, _ = model._pair_scores(params, batch[0], batch[2], dP, dQ)
    from acf_tpu.models.base import bpr_pair_loss
    expect_adv = bpr_pair_loss(pos_a, neg_a)
    np.testing.assert_allclose(float(aux["loss_adv"]), float(expect_adv),
                               rtol=1e-6)


def test_multi_step_adv_deltas():
    """adv_steps>1 (PGD-style): rows stay inside the eps-ball, perturbation
    differs from the single-step delta, and training still runs."""
    from acf_tpu.models.mf import MFBPR

    model1, params, u, i, j = setup(adversarial=True)
    model3 = MFBPR(model1.num_users, model1.num_items, model1.dim,
                   adversarial=True, eps=model1.eps, reg_adv=model1.reg_adv,
                   adv_steps=3)
    batch = (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j))
    dP1, dQ1 = model1.fgsm_deltas(params, *batch)
    dP3, dQ3 = model3.fgsm_deltas(params, *batch)
    for d in (dP3, dQ3):
        norms = np.sqrt(np.square(np.asarray(d)).sum(-1))
        assert norms.max() <= model3.eps + 1e-5
    assert not np.allclose(np.asarray(dP1), np.asarray(dP3))
    # batch rows with nonzero gradient get nonzero perturbation (a row whose
    # pos and neg items coincide can legitimately have zero grad every step)
    touched = np.unique(np.asarray(u))
    nP3 = np.sqrt(np.square(np.asarray(dP3)).sum(-1))
    assert nP3[touched].max() > 0.1
    untouched = sorted(set(range(20)) - set(touched.tolist()))
    assert nP3[untouched].max() == 0.0

    loss, aux = model3.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and np.isfinite(float(aux["loss_adv"]))


def test_manual_apr_grads_match_autodiff():
    """The closed-form fused-step gradients (MFBPR.manual_grads) must equal
    jax.grad of the autodiff APR loss — including duplicate-row aggregation
    in the FGSM normalize, the doubled reg term, and the aux stats."""
    for reg in (0.0, 0.3):
        model, params, u, i, j = setup(adversarial=True, reg=reg)
        # force duplicate users and items (incl. a pos/neg collision) so the
        # equality-matrix aggregation is actually exercised
        u[3] = u[0]
        u[7] = u[0]
        i[5] = i[1]
        j[2] = i[4]
        j[6] = j[1]
        batch = (jnp.asarray(u), jnp.asarray(i), jnp.asarray(j))
        key = jax.random.PRNGKey(1)

        (_, aux_ad), g_ad = jax.value_and_grad(model.loss, has_aux=True)(
            params, batch, key)
        assert model.manual_grads is not None
        g_m, aux_m = model.manual_grads(params, batch, key)

        for k in ("P", "Q"):
            np.testing.assert_allclose(g_m[k], g_ad[k], rtol=1e-5, atol=1e-7)
        for k in ("loss", "acc", "loss_adv", "acc_adv"):
            np.testing.assert_allclose(aux_m[k], aux_ad[k], rtol=1e-5,
                                       err_msg=k)


def test_manual_grads_gated_to_reference_config():
    """manual_grads only exists for grad-mode single-step adversarial MFBPR;
    every other configuration falls back to autodiff."""
    assert MFBPR(5, 5, 4, adversarial=True).manual_grads is not None
    assert MFBPR(5, 5, 4).manual_grads is None
    assert MFBPR(5, 5, 4, adversarial=True, adv_mode="random").manual_grads is None
    assert MFBPR(5, 5, 4, adversarial=True, adv_steps=3).manual_grads is None
