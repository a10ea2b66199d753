"""Fused Pallas encoder kernel (ops/sasrec_fused.py) vs the jnp reference
path — interpret mode on CPU, exact f32 equality expected."""

import jax
import jax.numpy as jnp
import numpy as np

from acf_tpu.models.sasrec import SASRec

B, T, D, I = 9, 8, 32, 50  # B=9 exercises chunk padding (9 -> 128)


def _fixture():
    m_ref = SASRec(20, I, D, maxlen=T, fused="never", train_dtype="float32")
    m_fus = SASRec(20, I, D, maxlen=T, fused="always", train_dtype="float32")
    params = m_ref.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.integers(0, I, (B, T)), jnp.int32)
    seq = seq.at[0, :5].set(0)  # padded prefix
    pos = jnp.asarray(rng.integers(1, I, (B, T)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, I, (B, T)), jnp.int32)
    users = jnp.arange(1, B + 1, dtype=jnp.int32)
    return m_ref, m_fus, params, (users, seq, pos, neg)


def test_fused_forward_inference_matches_jnp():
    m_ref, m_fus, params, (_, seq, _, _) = _fixture()
    r_ref = m_ref.encode(params, seq, train=False)
    r_fus = m_fus.encode(params, seq, train=False)
    np.testing.assert_allclose(r_fus, r_ref, rtol=1e-6, atol=1e-6)


def test_fused_forward_dropout_matches_jnp():
    m_ref, m_fus, params, (_, seq, _, _) = _fixture()
    key = jax.random.PRNGKey(3)
    r_ref = m_ref.encode(params, seq, train=True, key=key)
    r_fus = m_fus.encode(params, seq, train=True, key=key)
    np.testing.assert_allclose(r_fus, r_ref, rtol=1e-6, atol=1e-6)


def test_fused_loss_grads_match_jnp():
    """custom-VJP backward kernel == autodiff through the jnp encoder, for
    the full training loss (embedding scatter included)."""
    m_ref, m_fus, params, batch = _fixture()
    key = jax.random.PRNGKey(3)
    (l1, _), g1 = jax.value_and_grad(m_ref.loss, has_aux=True)(
        params, batch, key)
    (l2, _), g2 = jax.value_and_grad(m_fus.loss, has_aux=True)(
        params, batch, key)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for (p1, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_fused_adversarial_loss_matches_jnp():
    m_ref, m_fus, params, batch = _fixture()
    kwargs = dict(maxlen=T, adversarial=True, eps=0.5, reg_adv=1.0,
                  train_dtype="float32")  # f32: the fused kernel honors the
                  # compute dtype (bf16 MXU dots, f32 accum) — exact
                  # comparison vs the jnp path needs f32
    a_ref = SASRec(20, I, D, fused="never", **kwargs)
    a_fus = SASRec(20, I, D, fused="always", **kwargs)
    key = jax.random.PRNGKey(3)
    (l1, x1), g1 = jax.value_and_grad(a_ref.loss, has_aux=True)(
        params, batch, key)
    (l2, x2), g2 = jax.value_and_grad(a_fus.loss, has_aux=True)(
        params, batch, key)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    np.testing.assert_allclose(x1["loss_adv"], x2["loss_adv"], rtol=1e-6)
    for (p1, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_fused_chunk_scaling_longer_windows():
    """Chunk sizes shrink as T grows (VMEM budget); T=16 is the config that
    OOMed at the fixed 128-user chunk, T=50 is the reference maxlen where
    fwd/bwd chunks stop being the 4:1 power-of-two pair."""
    from acf_tpu.ops.sasrec_fused import _chunks

    for t, (c, cb) in [(8, (128, 32)), (16, (64, 16)), (50, (16, 8))]:
        assert _chunks(t) == (c, cb) and c % cb == 0

    for t in (16, 50):
        # pack_attention="never": the kernel is unpacked, and under dropout
        # the packed path draws its attention mask at the packed shape
        m_ref = SASRec(20, I, D, maxlen=t, fused="never",
                       train_dtype="float32", pack_attention="never")
        m_fus = SASRec(20, I, D, maxlen=t, fused="always",
                       train_dtype="float32", pack_attention="never")
        params = m_ref.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(t)
        seq = jnp.asarray(rng.integers(0, I, (5, t)), jnp.int32)
        key = jax.random.PRNGKey(1)
        r_ref = m_ref.encode(params, seq, train=True, key=key)
        r_fus = m_fus.encode(params, seq, train=True, key=key)
        # longer T accumulates attention sums in a different order than the
        # einsum path — pure f32 rounding, measured <= 2e-6 abs
        np.testing.assert_allclose(r_fus, r_ref, rtol=1e-4, atol=1e-5)


def test_fused_gate_falls_back():
    """Fused path only engages for single-head full-maxlen windows."""
    m = SASRec(20, I, D, maxlen=T, num_heads=2, fused="always")
    assert not m._use_fused(T)
    m1 = SASRec(20, I, D, maxlen=T, fused="always")
    assert m1._use_fused(T) and not m1._use_fused(T - 1)
    assert not SASRec(20, I, D, maxlen=T, fused="never")._use_fused(T)
