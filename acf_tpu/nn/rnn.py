"""Recurrent cells as pure scan bodies.

TF1's ``rnn_cell.GRUCell``/``BasicRNNCell`` and Keras ``SimpleRNN``
(reference GRU4Rec.py:181-187, DREAM.py:24/109-116) become ``lax.scan``
bodies here — XLA unrolls/fuses them; sequences are right-aligned and
0-padded so hidden state freezes on pad steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acf_tpu.nn.layers import glorot_uniform


def init_gru(key, d_in, d_h):
    """TF GRUCell layout: one [d_in+d_h, 2*d_h] gate kernel (r, u) and one
    [d_in+d_h, d_h] candidate kernel; gate bias init 1.0 (TF default)."""
    k1, k2 = jax.random.split(key)
    return {
        "w_gates": glorot_uniform(k1, (d_in + d_h, 2 * d_h)),
        "b_gates": jnp.ones((2 * d_h,)),
        "w_cand": glorot_uniform(k2, (d_in + d_h, d_h)),
        "b_cand": jnp.zeros((d_h,)),
    }


def gru_cell(p, x, h, activation=jnp.tanh):
    """One GRU step (TF semantics: candidate sees r*h)."""
    xh = jnp.concatenate([x, h], axis=-1)
    gates = jax.nn.sigmoid(xh @ p["w_gates"] + p["b_gates"])
    r, u = jnp.split(gates, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    c = activation(xrh @ p["w_cand"] + p["b_cand"])
    return u * h + (1.0 - u) * c


def init_simple_rnn(key, d_in, d_h):
    """Keras SimpleRNN: kernel glorot, recurrent kernel orthogonal, zero
    bias."""
    k1, k2 = jax.random.split(key)
    q, r = jnp.linalg.qr(jax.random.normal(k2, (d_h, d_h)))
    # Keras Orthogonal applies sign(diag(R)) so the draw is Haar-uniform;
    # plain qr()[0] has sign-biased columns
    w_rec = q * jnp.sign(jnp.diagonal(r))[None, :]
    return {
        "w_in": glorot_uniform(k1, (d_in, d_h)),
        "w_rec": w_rec,
        "b": jnp.zeros((d_h,)),
    }


def simple_rnn_cell(p, x, h):
    return jnp.tanh(x @ p["w_in"] + h @ p["w_rec"] + p["b"])


def run_rnn(cell, p, xs, mask, h0):
    """Scan a cell over time with pad masking.

    Args:
      cell: fn(p, x_t [B, d_in], h [B, d_h]) -> h'
      xs:   [B, T, d_in]
      mask: [B, T] bool — False positions keep the previous hidden state
        (Keras ``mask_zero=True`` semantics, reference DREAM.py:21).
      h0:   [B, d_h]

    Returns:
      (h_final [B, d_h], hs [B, T, d_h]) — hidden state *after* each step.
    """

    def body(h, inp):
        x_t, m_t = inp
        h_new = cell(p, x_t, h)
        h = jnp.where(m_t[:, None], h_new, h)
        return h, h

    xs_t = jnp.swapaxes(xs, 0, 1)      # [T, B, d_in]
    mask_t = jnp.swapaxes(mask, 0, 1)  # [T, B]
    h_final, hs = jax.lax.scan(body, h0, (xs_t, mask_t))
    return h_final, jnp.swapaxes(hs, 0, 1)
