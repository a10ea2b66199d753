"""Pallas TPU kernel: fused full-catalog rank-position evaluation.

The leave-one-out evaluator needs, per user, the number of catalog items
scoring >= the held-out item (reference evaluation_adv.py:472-473). The naive
formulation materializes a [B, num_items] score matrix in HBM (≈50 MB/tile)
just to immediately reduce it. This kernel streams item-embedding tiles
through VMEM: each grid step computes ``U_repr @ E_tile^T`` (+ optional item
bias) on the MXU, compares against the per-user threshold, and accumulates
counts — the score matrix never exists in HBM.

Candidate masking (exclude pad id 0, the user's train items, and the gt) is
restructured out of the hot loop: count over ALL items here, then subtract
the (≤ unique-hist + 2) invalid entries with a cheap gathered correction —
see ``FullRankEvaluator.positions_factored``.

Rounding note: TPU f32 matmuls accumulate differently from the VPU dot used
for thresholds/corrections, so items whose score ties the threshold within
~1 ulp can flip by ±1 position — metric impact is below run-to-run sampling
noise. The gt itself is handled exactly (its correction uses the same VPU
formulation as the threshold, so it cancels identically).

Falls back to pallas interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def _count_kernel(u_ref, e_ref, bias_ref, thresh_ref, gt_ref, out_ref, *,
                  item_tile, num_items):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # HIGHEST precision: TPU matmuls truncate f32 inputs to bf16 by default,
    # which perturbs scores enough to flip rank positions vs the VPU-dot
    # thresholds/corrections (observed: 92% of users off by a few ranks).
    scores = jnp.dot(u_ref[:], e_ref[:].T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [B, T]
    scores = scores + bias_ref[:]  # [1, T] broadcast
    # mask padding columns of the ragged final tile, the pad item id 0, and
    # each user's gt column (the gt must contribute exactly 0 to its own
    # rank regardless of MXU-vs-VPU rounding)
    col = j * item_tile + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, dimension=1)
    ge = (scores >= thresh_ref[:]) & (col < num_items) & (col > 0) \
        & (col != gt_ref[:])
    out_ref[:] += jnp.sum(ge.astype(jnp.float32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("item_tile", "interpret"))
def rank_positions_dot(u_repr, item_emb, thresholds, bias=None, gt=None,
                       item_tile: int = 2048, interpret: bool = False):
    """Count catalog items with ``u·e + bias_e >= threshold`` per user.

    Args:
      u_repr: [B, d] user representations (any model's final repr).
      item_emb: [I, d] item embedding/output table.
      thresholds: [B] per-user gt scores.
      bias: optional [I] per-item bias.
      gt: optional [B] per-user item column masked out of the count (the
          held-out item). Defaults to 0 (already excluded as the pad id).
      item_tile: items per VMEM tile (multiple of 128).

    Returns:
      [B] float32 counts over all items except id 0 and ``gt`` — callers
      subtract the user's train items via a gathered correction.
    """
    b, d = u_repr.shape
    if gt is None:
        gt = jnp.zeros((b,), jnp.int32)
    num_items = item_emb.shape[0]
    n_tiles = -(-num_items // item_tile)
    pad = n_tiles * item_tile - num_items
    if pad:
        item_emb = jnp.pad(item_emb, ((0, pad), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n_tiles * item_tile,), jnp.float32)
    elif pad:
        bias = jnp.pad(bias, (0, pad))

    kernel = functools.partial(_count_kernel, item_tile=item_tile,
                               num_items=num_items)
    counts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((item_tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, item_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 1), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(u_repr, item_emb, bias[None, :], thresholds[:, None], gt[:, None])
    return counts[:, 0]
