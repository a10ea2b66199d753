"""Mesh-sharded full-catalog evaluation.

The single-device evaluator (eval/full_rank.py) scores user tiles against
the whole item table at once — fine up to ~100k-item catalogs, but the
score matrix and the table itself are replicated per device. This module
shards BOTH axes of the evaluation over the mesh:

  * eval users over "data" (each device ranks its own user shard);
  * item-table rows over "model" (each device scores only its catalog
    shard and the per-user rank position is assembled with ONE ``psum``
    over the model axis — the "eval merge" collective, SURVEY.md §5).

Semantics are identical to ``eval/full_rank._positions_full`` (reference
candidate rule, evaluation_adv.py:425-437 / 472-473): position of the
held-out item = #{valid items with score >= gt_score}, valid = catalog
minus pad id 0, the user's train items, and the gt itself; ties count
against the gt. The dot contraction (over ``d``) is never split, so the
sharded scores are bit-identical to the single-device path and positions
match EXACTLY (tested on the 8-virtual-device CPU mesh).

Everything degenerates to the plain computation at mesh size 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_positions(mesh: Mesh, user_repr_fn, num_items: int):
    """Build the sharded rank-position function for dot-factored models
    (scores = ``user_repr(params, users, hists) @ table.T + bias``).

    Returns ``positions(params, table_shard, bias_shard, users, hists, gt)
    -> [B] int32`` where

      * ``params`` is replicated (the user tower / encoder weights);
      * ``table_shard`` is the item table placed with
        :func:`acf_tpu.parallel.sharded_embedding.shard_table` (row-sharded
        over "model", zero-padded to a multiple of the axis size — padded
        rows are masked out here via ``num_items``);
      * ``bias_shard`` is a per-item bias sharded ``P("model")`` (pass
        zeros for bias-free models);
      * ``users [B] / hists [B, L] / gt [B]`` are sharded over "data"
        (``B`` divisible by the data-axis size).
    """

    def positions(params, table_shard, bias_shard, users, hists, gt):
        # HIGHEST precision: TPU matmuls otherwise truncate f32→bf16 and
        # shift rank positions (same rule as eval/full_rank.py)
        with jax.default_matmul_precision("highest"):
            reprs = user_repr_fn(params, users, hists)        # [Bl, d]
            scores = reprs @ table_shard.T                    # [Bl, Il]
        scores = scores + bias_shard[None, :]
        bl, il = scores.shape
        rows = jnp.arange(bl)
        offset = jax.lax.axis_index("model") * il
        gids = offset + jnp.arange(il)                        # global item ids

        # gt score lives on exactly one model shard → one psum assembles it
        local_gt = gt - offset
        in_shard = (local_gt >= 0) & (local_gt < il)
        gt_local = jnp.where(
            in_shard, scores[rows, jnp.clip(local_gt, 0, il - 1)], 0.0)
        gt_score = jax.lax.psum(gt_local, "model")            # [Bl]

        # candidate mask: drop pad id 0, shard_table's zero-padded tail
        # rows (global id >= num_items), the user's train items, and the gt
        # itself. History ids outside this shard scatter into an extra
        # trash column (explicit, rather than relying on out-of-bounds
        # modes: negative indices would WRAP under numpy semantics and mask
        # a real item on nonzero shards).
        valid = ((gids != 0) & (gids < num_items))[None, :]
        valid = jnp.broadcast_to(valid, scores.shape)
        valid = jnp.concatenate(
            [valid, jnp.zeros((bl, 1), dtype=bool)], axis=1)
        hidx = hists - offset
        hidx = jnp.where((hidx >= 0) & (hidx < il), hidx, il)
        valid = valid.at[rows[:, None], hidx].set(False)
        valid = valid[:, :il]
        valid = valid & (gids[None, :] != gt[:, None])

        cnt = jnp.sum((scores >= gt_score[:, None]) & valid, axis=1)
        return jax.lax.psum(cnt, "model").astype(jnp.int32)   # [Bl]

    return jax.jit(shard_map(
        positions, mesh=mesh,
        in_specs=(P(), P("model", None), P("model"),
                  P("data"), P("data", None), P("data")),
        out_specs=P("data"),
    ))


def sharded_positions_for_model(mesh: Mesh, model, params, users, hists, gt):
    """Convenience wrapper: run the sharded evaluation for any model exposing
    ``factored_scorer()`` (MF family, SASRec, Caser, ...). Shards the item
    table on the fly — for repeated evaluation build the pieces once via
    :func:`make_sharded_positions` instead."""
    from acf_tpu.parallel.sharded_embedding import shard_table

    fs = model.factored_scorer()
    if fs is None:
        raise ValueError(f"{type(model).__name__} has no factored scorer")
    user_repr_fn, table_fn = fs
    table, bias = table_fn(params)
    table_shard = shard_table(mesh, table)
    if bias is None:
        bias = jnp.zeros((table.shape[0],), table.dtype)
    m = mesh.shape["model"]
    pad = (-bias.shape[0]) % m
    if pad:
        bias = jnp.pad(bias, (0, pad))
    from jax.sharding import NamedSharding
    bias_shard = jax.device_put(bias, NamedSharding(mesh, P("model")))
    fn = make_sharded_positions(mesh, user_repr_fn, model.num_items)
    from acf_tpu.parallel.mesh import shard_batch
    users, hists, gt = shard_batch(mesh, (users, hists, gt))
    return fn(params, table_shard, bias_shard, users, hists, gt)
