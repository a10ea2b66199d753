"""Fused Pallas TPU kernel for the SASRec encoder (forward + backward).

STATUS: opt-in experiment (``SASRec(fused="always")``), NOT the production
path. Measured on 1x v5e at Video scale (B=512, T=8, d=64, 2 blocks,
scripts/seq_step_decompose.py) the kernel LOSES to XLA's own fusion:
forward 221 vs 162 µs/step, full clean step 579 vs 491 µs, adversarial
1041 vs 738 µs. At these tiny shapes XLA already fuses well, while the
kernel pays for f32 (vs bf16-MXU) matmuls, the unrolled VPU attention,
and materialized dropout masks; larger backward chunks than _ROWS_BWD=256
OOM the 16 MB scoped VMEM. Kept because it is a correct, fully-tested
whole-encoder custom-VJP kernel (forward + backward that rematerializes
the forward in-kernel and differentiates it at trace time via ``jax.vjp``
— no hand-derived gradients to get wrong) and the economics flip if d or
num_blocks grow. See docs/ROADMAP.md for the full investigation note.

Semantics: exactly ``SASRec.encode_math`` (models/sasrec.py) — the
reference encoder (SASRecLayers.py:15-319) with precomputed dropout masks.
The only numeric difference vs the XLA path is matmul precision: in-kernel
``jnp.dot`` runs f32 (the XLA path truncates to bf16 at default precision),
so the kernel is slightly MORE precise.

Attention is computed with static python loops over the T key positions
(T ≤ 50) in pure 3D ops — Mosaic supports neither batched ``dot_general``
nor middle-axis reductions well, and at T=8 the unrolled VPU form is faster
than MXU batching anyway.

Grid: users are processed in chunks of ``_CHUNK`` (batch is padded up to a
multiple); weight gradients accumulate across sequential grid steps into
constant-index output blocks.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -(2.0 ** 32) + 1  # reference mask value (SASRecLayers.py:208)
# VMEM scales with rows-per-chunk (C*T), so the user-chunk shrinks as T
# grows; 1024/256 rows are the largest footprints that fit the 16 MB scoped
# limit at d=64 (measured: C=128/T=16 fwd needs 18 MB and OOMs).
# Env overrides exist for on-TPU tuning sweeps (scripts/seq_step_decompose).
import os as _os

_ROWS_FWD = int(_os.environ.get("SASREC_FUSED_ROWS_FWD", "1024"))
_ROWS_BWD = int(_os.environ.get("SASREC_FUSED_ROWS_BWD", "256"))


def _chunks(t: int):
    # chunk sizes must stay multiples of 8: 2D mask blocks [C, T] need
    # their leading block dim divisible by 8 (Mosaic block-shape rule)
    cb = max(8, _ROWS_BWD // t)
    # fwd chunk a multiple of the bwd chunk so one batch pad serves both
    c = max(cb, _ROWS_FWD // t // cb * cb)
    return c, cb


# the [N,N] block-diag attention's vjp at T=50/cb=8 needs ~16.2 MB scoped
# VMEM — just over Mosaic's 16 MB default; v5e has 128 MB of VMEM
_VMEM_LIMIT = int(_os.environ.get("SASREC_FUSED_VMEM_MB", "64")) * 2 ** 20


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# in-kernel math (shared by forward and backward kernels)
# ---------------------------------------------------------------------------

def _layer_norm(g, b, x, eps=1e-8):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return g * (x - mean) * jax.lax.rsqrt(var + eps) + b


def _dot(a, b, cd):
    """MXU dot in compute dtype ``cd`` with f32 accumulation — cd=f32 keeps
    the kernel's original exact-f32 semantics; cd=bf16 runs the MXU at full
    rate (the XLA path truncates to bf16 at default precision anyway)."""
    return jnp.dot(a.astype(cd), b.astype(cd),
                   preferred_element_type=jnp.float32)


def _dense(w, b, x, cd=jnp.float32):
    return _dot(x, w, cd) + b


# attention form switch: below this T the unrolled 3D VPU form wins (MXU
# matmuls would be [T,d]@[d,T] slivers, one per user); at/above it the
# whole-chunk [N,N] block-diagonal MXU form is used — ONE [N,d]@[d,N]
# score matmul per chunk instead of C [T,d]@[d,T] slivers (the sliver loop
# was the measured reason the round-1 kernel lost to XLA at T=50).
_MXU_ATTN_T = 32


def _attention_math(ws_blk, q_in, maskq, maskq_nd, p_mask, keep, c, t,
                    cd=jnp.float32):
    """q_in [N=C*T, d]; maskq [C, T]; maskq_nd [N, d] (the pre-broadcast
    ids mask — its first column doubles as the flat [N,1] mask vector);
    p_mask [C, T*T] or None."""
    d = q_in.shape[-1]
    n = c * t
    q = _dense(ws_blk["wq"]["w"], ws_blk["wq"]["b"], q_in, cd)
    k = _dense(ws_blk["wk"]["w"], ws_blk["wk"]["b"], q_in, cd)
    v = _dense(ws_blk["wv"]["w"], ws_blk["wv"]["b"], q_in, cd)
    scale = 1.0 / math.sqrt(d)
    # tril via iota compare (Mosaic cannot lower int->bool truncation)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    causal = rows >= cols

    if t >= _MXU_ATTN_T:
        # whole-chunk block-diagonal attention: one [N,N] score matmul;
        # off-block entries are masked to -2³² so their softmax weight
        # underflows to exactly 0 (same argument as SASRec.pack_attention).
        # Mask vectors come from maskq_nd [N,1] (a column slice of the
        # pre-broadcast [N,d] mask — Mosaic cannot shape-cast [C,T]→[N,1])
        # and its 2D transpose for the key side.
        rn = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cn = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        same = (rn // t) == (cn // t)
        caus = (rn % t) >= (cn % t)
        s = _dot(q, k.T, cd) * scale
        mq_col = maskq_nd[:, 0:1]                    # [N,1] query-side
        keym = jnp.transpose(mq_col) > 0             # [1,N] key-side
        s = jnp.where(same & caus & keym, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1) * mq_col
        if p_mask is None:
            return _dot(p, v, cd) + q_in  # off-block p rows are exact zeros
        # dropout applies per-user [T,T] masks: slice the diagonal blocks
        # (static slices), mask, and PV per user
        outs = []
        for i in range(c):
            pi = p[i * t:(i + 1) * t, i * t:(i + 1) * t]
            pi = jnp.where(p_mask[i].reshape(t, t) > 0, pi / keep, 0.0)
            outs.append(_dot(pi, v[i * t:(i + 1) * t, :], cd))
        return jnp.concatenate(outs, axis=0) + q_in

    q, k, v = (a.reshape(c, t, d) for a in (q, k, v))
    # scores[:, :, s] = <q, k_s> — static loop keeps everything 3D (VPU)
    scores = jnp.concatenate(
        [jnp.sum(q * k[:, s:s + 1, :], axis=-1, keepdims=True) * scale
         for s in range(t)], axis=-1)  # [C, T, T]
    keym = maskq[:, None, :] > 0          # [C, 1, T] key mask
    scores = jnp.where(causal[None] & keym, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * maskq[:, :, None]     # query masking
    if p_mask is not None:
        probs = jnp.where(p_mask > 0, probs / keep, 0.0)
    out = sum(probs[:, :, s:s + 1] * v[:, s:s + 1, :] for s in range(t))
    return out.reshape(c * t, d) + q_in    # residual onto normalized input


def _encoder_math(ws, x, maskf_nd, maskq, dmasks, *, keep, c, t,
                  cd=jnp.float32):
    """2D-first encoder: every elementwise/LN/matmul op runs on [N=C*T, d]
    (full-height sublane tiles); 3D [C,T,*] only inside attention. Inputs:
    x [C,T,d]; maskf_nd [N,d] (ids mask pre-broadcast over d); maskq [C,T];
    dmask leaves [N,d] (emb/f1/f2) / [C,T,T] (probs)."""
    def drop(y, m):
        if m is None:
            return y
        return jnp.where(m > 0, y / keep, 0.0)

    n = c * t
    x = (x + ws["pos_emb"][None]).reshape(n, -1)
    x = drop(x, None if dmasks is None else dmasks["emb"])
    x = x * maskf_nd
    for i, blk in enumerate(ws["blocks"]):
        bm = None if dmasks is None else dmasks["blocks"][i]
        q_in = _layer_norm(blk["ln1"]["gamma"], blk["ln1"]["beta"], x)
        x = _attention_math(blk, q_in, maskq, maskf_nd,
                            None if bm is None else bm["p"], keep, c, t, cd)
        x2 = _layer_norm(blk["ln2"]["gamma"], blk["ln2"]["beta"], x)
        f = jax.nn.relu(_dense(blk["conv1"]["w"], blk["conv1"]["b"], x2, cd))
        f = drop(f, None if bm is None else bm["f1"])
        f = _dense(blk["conv2"]["w"], blk["conv2"]["b"], f, cd)
        f = drop(f, None if bm is None else bm["f2"])
        f = f + x2
        x = _layer_norm(blk["ln3"]["gamma"], blk["ln3"]["beta"], f)
        x = x * maskf_nd
    return _layer_norm(ws["ln_f"]["gamma"], ws["ln_f"]["beta"], x)


# ---------------------------------------------------------------------------
# pallas plumbing
# ---------------------------------------------------------------------------

def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _chunk_spec(shape):
    # block over leading (user-chunk) axis
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nd: (i,) + (0,) * (_n - 1),
                        memory_space=pltpu.VMEM)


@lru_cache(maxsize=None)
def _make_fused(num_blocks: int, t: int, d: int, keep: float,
                has_dropout: bool, ws_treedef, dm_treedef, interpret: bool,
                cd_name: str = "float32"):
    """Build the custom-VJP fused encoder for one static configuration.

    I/O layout: x [B,T,d] / dx [B,T,d]; everything else row-flattened so the
    kernel works on full-height [C*T, d] sublane tiles (see _encoder_math).
    """
    c, cb = _chunks(t)
    cd = jnp.dtype(cd_name)

    def unflatten(treedef, refs):
        return jax.tree.unflatten(treedef, [r[:] for r in refs])

    n_ws = ws_treedef.num_leaves
    n_dm = dm_treedef.num_leaves if has_dropout else 0

    def fwd_kernel(*refs):
        x_ref, mnd_ref, mq_ref = refs[0], refs[1], refs[2]
        ws_refs = refs[3:3 + n_ws]
        dm_refs = refs[3 + n_ws:3 + n_ws + n_dm]
        out_ref = refs[3 + n_ws + n_dm]
        ws = unflatten(ws_treedef, ws_refs)
        dm = unflatten(dm_treedef, dm_refs) if has_dropout else None
        cc = x_ref.shape[0]
        out_ref[:] = _encoder_math(ws, x_ref[:], mnd_ref[:], mq_ref[:], dm,
                                   keep=keep, c=cc, t=t, cd=cd)

    def bwd_kernel(*refs):
        x_ref, mnd_ref, mq_ref, g_ref = refs[0], refs[1], refs[2], refs[3]
        ws_refs = refs[4:4 + n_ws]
        dm_refs = refs[4 + n_ws:4 + n_ws + n_dm]
        dx_ref = refs[4 + n_ws + n_dm]
        dw_refs = refs[4 + n_ws + n_dm + 1:]
        ws = unflatten(ws_treedef, ws_refs)
        dm = unflatten(dm_treedef, dm_refs) if has_dropout else None
        mnd, mq = mnd_ref[:], mq_ref[:]
        cc = x_ref.shape[0]

        def f(x, ws_):
            return _encoder_math(ws_, x, mnd, mq, dm, keep=keep, c=cc, t=t,
                                 cd=cd)

        _, pull = jax.vjp(f, x_ref[:], ws)
        dx, dws = pull(g_ref[:])
        dx_ref[:] = dx
        dws_flat = jax.tree.leaves(dws)
        i = pl.program_id(0)
        for r, val in zip(dw_refs, dws_flat):
            @pl.when(i == 0)
            def _(r=r, val=val):
                r[:] = val

            @pl.when(i != 0)
            def _(r=r, val=val):
                r[:] = r[:] + val

    def _specs(ws_flat, dm_flat, with_g, cc, b_pad):
        in_specs = [_chunk_spec((cc, t, d)),          # x
                    _chunk_spec((cc * t, d)),          # maskf broadcast [N,d]
                    _chunk_spec((cc, t))]              # maskq
        if with_g:
            in_specs.append(_chunk_spec((cc * t, d)))  # upstream cotangent
        in_specs += [_const_spec(w.shape) for w in ws_flat]
        # mask leaves are [B*T, d] (emb/f1/f2) or [B, T*T] (p): block rows
        # scale with each leaf's rows-per-user (unambiguous even when
        # T*T == d)
        in_specs += [_chunk_spec((m.shape[0] // b_pad * cc,) + m.shape[1:])
                     for m in dm_flat]
        return in_specs

    @jax.custom_vjp
    def apply(ws, x, maskf_nd, maskq, dmasks):
        ws_flat = jax.tree.leaves(ws)
        dm_flat = jax.tree.leaves(dmasks) if has_dropout else []
        grid = x.shape[0] // c
        return pl.pallas_call(
            fwd_kernel,
            grid=(grid,),
            in_specs=_specs(ws_flat, dm_flat, with_g=False, cc=c,
                            b_pad=x.shape[0]),
            out_specs=_chunk_spec((c * t, d)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0] * t, d), x.dtype),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(x, maskf_nd, maskq, *ws_flat, *dm_flat)

    def apply_fwd(ws, x, maskf_nd, maskq, dmasks):
        out = apply(ws, x, maskf_nd, maskq, dmasks)
        return out, (ws, x, maskf_nd, maskq, dmasks)

    def apply_bwd(res, g):
        ws, x, maskf_nd, maskq, dmasks = res
        ws_flat = jax.tree.leaves(ws)
        dm_flat = jax.tree.leaves(dmasks) if has_dropout else []
        grid = x.shape[0] // cb
        out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)]
                      + [jax.ShapeDtypeStruct(w.shape, w.dtype)
                         for w in ws_flat])
        out_specs = ([_chunk_spec((cb, t, d))]
                     + [_const_spec(w.shape) for w in ws_flat])
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(grid,),
            in_specs=_specs(ws_flat, dm_flat, with_g=True, cc=cb,
                            b_pad=x.shape[0]),
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(x, maskf_nd, maskq, g, *ws_flat, *dm_flat)
        dx, dws_flat = outs[0], outs[1:]
        dws = jax.tree.unflatten(ws_treedef, list(dws_flat))
        dmask_zeros = (jax.tree.map(jnp.zeros_like, dmasks)
                       if has_dropout else None)
        return (dws, dx, jnp.zeros_like(maskf_nd), jnp.zeros_like(maskq),
                dmask_zeros)

    apply.defvjp(apply_fwd, apply_bwd)
    return apply


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def fused_encoder(model, params, x, ids_mask, masks, dtype=None):
    """Drop-in replacement for ``SASRec.encode_math`` on TPU.

    x: [B, T, d] pre-assembled (√d-scaled) input embeddings; ids_mask
    [B, T] bool; masks = the model's precomputed dropout masks or None;
    dtype = in-kernel MXU compute dtype (None → exact f32).
    """
    b, t, d = x.shape
    keep = 1.0 - model.dropout_rate
    ws = {
        "pos_emb": params["pos_emb"][-t:],
        "blocks": [
            {k: blk[k] for k in
             ("ln1", "wq", "wk", "wv", "ln2", "conv1", "conv2", "ln3")}
            for blk in params["blocks"]
        ],
        "ln_f": params["ln_f"],
    }
    # Mosaic wants >=2D operands: lift [d] vectors to [1, d] (outer autodiff
    # transposes the reshape back onto the original leaves).
    ws = jax.tree.map(lambda a: a.reshape(1, -1) if a.ndim == 1 else a, ws)
    has_dropout = masks is not None
    dmasks = None
    if has_dropout:
        # the model hands bool masks (HBM-lean); the kernel computes in f32
        masks = jax.tree.map(lambda m: m.astype(jnp.float32), masks)
        # flatten to the kernel layout: [B*T, d] row tiles, [B, T*T] probs
        dmasks = {"emb": masks["emb"].reshape(b * t, d),
                  "blocks": [{"p": bm["p"][:, 0],  # [B, T, T]
                              "f1": bm["f1"].reshape(b * t, d),
                              "f2": bm["f2"].reshape(b * t, d)}
                             for bm in masks["blocks"]]}

    maskq = ids_mask.astype(jnp.float32)                       # [B, T]
    maskf_nd = jnp.broadcast_to(maskq[:, :, None],
                                (b, t, d)).reshape(b * t, d)   # [N, d]
    pad = (-b) % _chunks(t)[0]
    if pad:
        def _pad(m):
            rows = m.shape[0] // b * pad
            return jnp.concatenate(
                [m, jnp.zeros((rows,) + m.shape[1:], m.dtype)], axis=0)
        x = _pad(x)
        maskq = _pad(maskq)
        maskf_nd = _pad(maskf_nd)
        if has_dropout:
            dmasks = jax.tree.map(_pad, dmasks)

    ws_treedef = jax.tree.structure(ws)
    dm_treedef = jax.tree.structure(dmasks) if has_dropout else \
        jax.tree.structure(None)
    apply = _make_fused(model.num_blocks, t, d, keep, has_dropout,
                        ws_treedef, dm_treedef, _interpret(),
                        jnp.dtype(dtype or jnp.float32).name)
    out = apply(ws, x, maskf_nd, maskq, dmasks)
    return out[:b * t].reshape(b, t, d)
