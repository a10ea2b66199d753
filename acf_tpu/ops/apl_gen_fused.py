"""Pallas TPU kernels: fused APL generator-phase sample + backward.

The APL generator step differentiates a scalar loss through a full-catalog
chain (reference APL.py:193-203 semantics; closed form in
``models/apl.py::gen_step_manual``):

  logits = P_g[u] Q_g^T              [B, I]
  probs  = softmax(logits)           (pad col 0 at -1e30)
  mixed  = (1-w)·probs + w·member/nuniq
  z      = (log(mixed+eps) + gumbel)/T
  s      = softmax(z)
  fake_b = Σ_i s_bi · c_bi,   c = P_c[u] Q_c^T
  dL/dlogits = probs ∘ (r − ⟨probs, r⟩),
      r = (1-w)/T · s ∘ a(c − fake) / (mixed+eps),  a = ∂L/∂fake

Executed in XLA (autodiff OR the closed form — measured identical,
out/r5/apl_manual_ab.log) this materializes ~half a dozen [B, I] f32
arrays per step (48 MB each at Video scale) plus layout copies: the r4 op
profile put 48% of the generator step in transpose/copy. These kernels
stream item tiles through VMEM instead. Five sequential passes, each
recomputing the cheap [B,d]x[d,T] tile matmuls on the MXU:

  P1  online logsumexp of logits            → m1, l1        [B]
  P2  z tile = (log(mixed)+g)/T, stored;    → z [B, I], m2, l2
  P3  fake = Σ s·c                          → fake          [B]
  (caller: a = ∂L/∂fake — tiny [B] autodiff)
  P4  R = ⟨probs, r⟩                        → R             [B]
  P5  dlogits tile → dP += dlogits·Qg_tile, dQ_tile = dlogitsᵀ·P[u]

Only ``z`` (one [B, I] f32) round-trips HBM; everything else lives per
tile in VMEM. The gumbel noise is precomputed OUTSIDE with the same
``jax.random`` draw as the XLA paths, so trajectories are directly
comparable (and the kernels run under ``interpret=True`` on CPU for
tests).

Numerics: softmaxes here are explicit max-shifted exp/sum — same
formulation as ``jax.nn.softmax`` up to reduction order; matmuls use f32
accumulation at the backend's default input precision, matching the XLA
paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-20
NEG = -1e30


def _masked_logits(pu_ref, qg_ref, j, item_tile, num_items):
    # dot_general with explicit contracting dims — no .T materialization
    # for Mosaic to lower
    logits = jax.lax.dot_general(
        pu_ref[:], qg_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, T]
    col = j * item_tile + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1)
    # pad item col 0 AND the ragged tail tile: no probability mass
    return jnp.where((col > 0) & (col < num_items), logits, NEG)


def _stats1_kernel(pu_ref, qg_ref, m_ref, l_ref, *, item_tile, num_items):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    logits = _masked_logits(pu_ref, qg_ref, j, item_tile, num_items)
    t_max = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_ref[:], t_max)
    l_ref[:] = (l_ref[:] * jnp.exp(m_ref[:] - m_new)
                + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
    m_ref[:] = m_new


def _z_kernel(pu_ref, qg_ref, member_ref, nuniq_ref, noise_ref, m1_ref,
              l1_ref, z_ref, m2_ref, l2_ref, *, item_tile, num_items, w,
              temperature):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m2_ref[:] = jnp.full_like(m2_ref, NEG)
        l2_ref[:] = jnp.zeros_like(l2_ref)

    logits = _masked_logits(pu_ref, qg_ref, j, item_tile, num_items)
    probs = jnp.exp(logits - m1_ref[:]) / l1_ref[:]
    mixed = (1.0 - w) * probs + w * member_ref[:].astype(
        jnp.float32) / nuniq_ref[:]
    z = (jnp.log(mixed + EPS) + noise_ref[:]) / temperature
    col = j * item_tile + jax.lax.broadcasted_iota(
        jnp.int32, z.shape, dimension=1)
    # ragged tail: no softmax mass (col 0 stays live — the XLA softmax
    # includes it with ~0 probability, so the denominators must too)
    z = jnp.where(col < num_items, z, NEG)
    z_ref[:] = z
    t_max = jnp.max(z, axis=1, keepdims=True)
    m_new = jnp.maximum(m2_ref[:], t_max)
    l2_ref[:] = (l2_ref[:] * jnp.exp(m2_ref[:] - m_new)
                 + jnp.sum(jnp.exp(z - m_new), axis=1, keepdims=True))
    m2_ref[:] = m_new


def _fake_kernel(puc_ref, qc_ref, z_ref, m2_ref, l2_ref, fake_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        fake_ref[:] = jnp.zeros_like(fake_ref)

    c = jax.lax.dot_general(
        puc_ref[:], qc_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = jnp.exp(z_ref[:] - m2_ref[:]) / l2_ref[:]
    fake_ref[:] += jnp.sum(s * c, axis=1, keepdims=True)


def _r_tile(pu_ref, qg_ref, puc_ref, qc_ref, member_ref, nuniq_ref, z_ref,
            m1_ref, l1_ref, m2_ref, l2_ref, a_ref, fake_ref, j, item_tile,
            num_items, w, temperature):
    logits = _masked_logits(pu_ref, qg_ref, j, item_tile, num_items)
    probs = jnp.exp(logits - m1_ref[:]) / l1_ref[:]
    mixed = (1.0 - w) * probs + w * member_ref[:].astype(
        jnp.float32) / nuniq_ref[:]
    c = jax.lax.dot_general(
        puc_ref[:], qc_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = jnp.exp(z_ref[:] - m2_ref[:]) / l2_ref[:]
    t = a_ref[:] * (c - fake_ref[:])
    r = ((1.0 - w) / temperature) * s * t / (mixed + EPS)
    return probs, r


def _bigr_kernel(pu_ref, qg_ref, puc_ref, qc_ref, member_ref, nuniq_ref,
                 z_ref, m1_ref, l1_ref, m2_ref, l2_ref, a_ref, fake_ref,
                 bigr_ref, *, item_tile, num_items, w, temperature):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        bigr_ref[:] = jnp.zeros_like(bigr_ref)

    probs, r = _r_tile(pu_ref, qg_ref, puc_ref, qc_ref, member_ref,
                       nuniq_ref, z_ref, m1_ref, l1_ref, m2_ref, l2_ref,
                       a_ref, fake_ref, j, item_tile, num_items, w,
                       temperature)
    bigr_ref[:] += jnp.sum(probs * r, axis=1, keepdims=True)


def _grad_kernel(pu_ref, qg_ref, puc_ref, qc_ref, member_ref, nuniq_ref,
                 z_ref, m1_ref, l1_ref, m2_ref, l2_ref, a_ref, fake_ref,
                 bigr_ref, dq_ref, dp_ref, *, item_tile, num_items, w,
                 temperature):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dp_ref[:] = jnp.zeros_like(dp_ref)

    probs, r = _r_tile(pu_ref, qg_ref, puc_ref, qc_ref, member_ref,
                       nuniq_ref, z_ref, m1_ref, l1_ref, m2_ref, l2_ref,
                       a_ref, fake_ref, j, item_tile, num_items, w,
                       temperature)
    dlogits = probs * (r - bigr_ref[:])                       # [B, T]
    dq_ref[:] = jax.lax.dot_general(                          # [T, d]
        dlogits, pu_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_ref[:] += jnp.dot(dlogits, qg_ref[:],
                         preferred_element_type=jnp.float32)  # [B, d]


def _specs(b, d, item_tile):
    full_b = lambda width: pl.BlockSpec((b, width), lambda j: (0, 0),
                                        memory_space=pltpu.VMEM)
    qtile = pl.BlockSpec((item_tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM)
    btile = pl.BlockSpec((b, item_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
    return full_b, qtile, btile, full_b(1)


def _pad_tables(item_tile, *arrays_axis):
    """Pad each (array, axis) pair to a multiple of ``item_tile``."""
    out = []
    for arr, axis in arrays_axis:
        p = (-arr.shape[axis]) % item_tile
        if p:
            padw = [(0, 0)] * arr.ndim
            padw[axis] = (0, p)
            arr = jnp.pad(arr, padw)
        out.append(arr)
    return out


def apl_gen_forward(pu_g, Qg, pu_c, Qc, member, nuniq, gnoise,
                    *, w: float, temperature: float,
                    item_tile: int = 512, interpret: bool = False):
    """Passes P1-P3.

    Args:
      pu_g/pu_c: [B, d] gathered generator/critic user rows.
      Qg/Qc: [I, d] generator/critic item tables.
      member: [B, I] bfloat16 — 1 where the item is one of the user's unique
        positives (p_aux support; pad col 0 must be 0).
      nuniq: [B] float32 — per-user unique-positive count (>= 1).
      gnoise: [B, I] float32 — the GUMBEL noise, drawn by the caller with
        jax.random (same stream as the XLA paths).

    Returns ``(fake [B], residuals)``; hand ``residuals`` plus
    ``a = dL/dfake`` to :func:`apl_gen_backward`.
    """
    b, d = pu_g.shape
    num_items = Qg.shape[0]
    n_tiles = -(-num_items // item_tile)
    Qg, Qc, member, gnoise = _pad_tables(
        item_tile, (Qg, 0), (Qc, 0), (member, 1), (gnoise, 1))
    ip = n_tiles * item_tile

    kw = dict(item_tile=item_tile, num_items=num_items)
    full_b, qtile, btile, bcol = _specs(b, d, item_tile)
    stat = jax.ShapeDtypeStruct((b, 1), jnp.float32)

    m1, l1 = pl.pallas_call(
        functools.partial(_stats1_kernel, **kw),
        grid=(n_tiles,),
        in_specs=[full_b(d), qtile],
        out_specs=(bcol, bcol),
        out_shape=(stat, stat),
        interpret=interpret,
    )(pu_g, Qg)

    mixkw = dict(**kw, w=w, temperature=temperature)
    z, m2, l2 = pl.pallas_call(
        functools.partial(_z_kernel, **mixkw),
        grid=(n_tiles,),
        in_specs=[full_b(d), qtile, btile, bcol, btile, bcol, bcol],
        out_specs=(btile, bcol, bcol),
        out_shape=(jax.ShapeDtypeStruct((b, ip), jnp.float32), stat, stat),
        interpret=interpret,
    )(pu_g, Qg, member, nuniq[:, None], gnoise, m1, l1)

    fake = pl.pallas_call(
        _fake_kernel,
        grid=(n_tiles,),
        in_specs=[full_b(d), qtile, btile, bcol, bcol],
        out_specs=bcol,
        out_shape=stat,
        interpret=interpret,
    )(pu_c, Qc, z, m2, l2)

    # num_items rides along as a static python int (shapes are static
    # under jit, so this never becomes a tracer)
    res = (Qg, Qc, member, z, m1, l1, m2, l2, fake, num_items)
    return fake[:, 0], res


def apl_gen_backward(pu_g, pu_c, nuniq, a, res,
                     *, w: float, temperature: float,
                     item_tile: int = 512, interpret: bool = False):
    """Passes P4-P5: chain gradients ``(dP_rows [B, d], dQ [I, d])`` wrt
    the gathered generator user rows and the generator table
    (regularization terms are the caller's business). ``res`` is the
    residual tuple from :func:`apl_gen_forward`; tables inside it are
    already tile-padded."""
    Qg, Qc, member, z, m1, l1, m2, l2, fake, num_items = res
    b, d = pu_g.shape
    ip = Qg.shape[0]
    n_tiles = ip // item_tile

    full_b, qtile, btile, bcol = _specs(b, d, item_tile)
    stat = jax.ShapeDtypeStruct((b, 1), jnp.float32)
    mixkw = dict(item_tile=item_tile, num_items=num_items, w=w,
                 temperature=temperature)

    chain_in_specs = [full_b(d), qtile, full_b(d), qtile, btile, bcol,
                      btile, bcol, bcol, bcol, bcol, bcol, bcol]
    chain_args = (pu_g, Qg, pu_c, Qc, member, nuniq[:, None], z, m1, l1,
                  m2, l2, a[:, None], fake)

    bigr = pl.pallas_call(
        functools.partial(_bigr_kernel, **mixkw),
        grid=(n_tiles,),
        in_specs=chain_in_specs,
        out_specs=bcol,
        out_shape=stat,
        interpret=interpret,
    )(*chain_args)

    dQ, dP = pl.pallas_call(
        functools.partial(_grad_kernel, **mixkw),
        grid=(n_tiles,),
        in_specs=chain_in_specs + [bcol],
        out_specs=(qtile, full_b(d)),
        out_shape=(jax.ShapeDtypeStruct((ip, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, d), jnp.float32)),
        interpret=interpret,
    )(*chain_args, bigr)

    return dP, dQ
