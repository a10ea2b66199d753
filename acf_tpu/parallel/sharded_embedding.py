"""Row-sharded embedding tables with explicit collective lookup.

The reference keeps every table on one host (SURVEY.md §2.2 — no
distribution anywhere). For pod-scale catalogs this module shards
user/item tables row-wise over the mesh "model" axis and performs lookup
inside ``shard_map``:

  each device gathers the rows of the requested ids that live in its own
  shard (masked to zero elsewhere) and a single ``psum`` over the model
  axis assembles the full [B, d] activation — bandwidth B·d per device
  over ICI, no host gathers.

Gradients flow back as a local masked scatter-add (custom VJP on
``sharded_lookup`` — see its docstring) followed by one psum over whatever
batch axes the ids varied on, so each device accumulates exactly its own
rows' *total* gradients — which also makes the APR/FGSM delta *local*:
row-wise L2 normalization (evaluation_adv.py:202-203) touches only one shard
per row, no cross-device exchange needed.

Everything degenerates to a plain gather at mesh size 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_table(mesh: Mesh, table, axis: str = "model"):
    """Pad rows to a multiple of the axis size and place row-sharded."""
    m = mesh.shape[axis]
    rows = table.shape[0]
    pad = (-rows) % m
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    return jax.device_put(table, NamedSharding(mesh, P(axis, None)))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sharded_lookup(table_local, ids, axis: str = "model"):
    """Lookup inside ``shard_map``: ``table_local`` is this device's row
    shard [I_local, d]; ``ids`` are GLOBAL row ids [B] (replicated over the
    model axis). Returns the full [B, d] activation on every device.

    Carries a custom VJP: the naive ``grad`` through ``psum`` inside
    shard_map double-counts by the model-axis size (psum's transpose is a
    psum of the already-replicated cotangent). The true backward is a LOCAL
    masked scatter-add, followed by one psum over whatever *batch* axes the
    cotangent varies on beyond the table itself (normally "data") so the
    returned cotangent carries the same varying-manual-axes type as the
    primal — required by shard_map's vma checker (the driver environment
    runs with bwd type checks enabled; tests/conftest.py mirrors that).
    Callers therefore receive the fully data-reduced table gradient and
    must NOT psum it again.
    """
    return _lookup_impl(table_local, ids, axis)


def _local_window(i_local, ids, axis):
    base = jax.lax.axis_index(axis) * i_local
    local = ids - base
    ok = (local >= 0) & (local < i_local)
    return jnp.clip(local, 0, i_local - 1), ok


def _lookup_impl(table_local, ids, axis):
    idx, ok = _local_window(table_local.shape[0], ids, axis)
    rows = jnp.where(ok[:, None], table_local[idx], 0.0)
    return jax.lax.psum(rows, axis)


def _vma(x):
    """The varying-manual-axes set of ``x`` (empty outside shard_map or on
    jax versions without vma-in-types)."""
    try:
        return frozenset(jax.typeof(x).vma)
    except (AttributeError, TypeError):
        return frozenset()


def _lookup_fwd(table_local, ids, axis):
    # table_local[:0] is a zero-row proxy that carries the primal's vma type
    # into the bwd rule (shape[0] stays a static Python int residual)
    return _lookup_impl(table_local, ids, axis), (
        table_local.shape[0], table_local[:0], ids)


def _lookup_bwd(axis, res, ct):
    i_local, proxy, ids = res
    idx, ok = _local_window(i_local, ids, axis)
    g = jnp.zeros((i_local, ct.shape[-1]), ct.dtype)
    g = g.at[idx].add(jnp.where(ok[:, None], ct, 0.0))
    # reduce over the batch axes the cotangent picked up that the primal
    # table does not carry (e.g. "data" when ids are batch-sharded): the
    # scatter output varies over them, the table-shard primal does not
    extra = _vma(g) - _vma(proxy)
    if extra:
        g = jax.lax.psum(g, tuple(sorted(extra)))
    return g, None


sharded_lookup.defvjp(_lookup_fwd, _lookup_bwd)


# FGSM row normalization on a row shard is identical to the global operation
# because rows are never split across devices — alias the single source of
# truth so the two paths cannot desynchronize.
from acf_tpu.models.base import row_normalize as row_normalize_local  # noqa: E402


def make_sharded_bpr_step(mesh: Mesh, eps: float = 0.0, reg_adv: float = 1.0,
                          lr: float = 0.05):
    """A fully-sharded (data × model) adversarial BPR train step built on
    ``shard_map``: batch sharded over "data", tables row-sharded over
    "model"; gradient reduction over "data" via psum; FGSM deltas computed
    shard-locally. SGD update for self-containedness (the production path
    uses the pjit trainer; this is the explicit-collectives reference
    implementation and the multi-chip dry-run target)."""

    def step(P_shard, Q_shard, users, pos, neg):
        # inside shard_map: P_shard [U/m, d], Q_shard [I/m, d],
        # users/pos/neg [B/dp] (sharded over "data", replicated over "model")
        def loss_fn(tables):
            Pl, Ql = tables
            pu = sharded_lookup(Pl, users)
            qp = sharded_lookup(Ql, pos)
            qn = sharded_lookup(Ql, neg)
            diff = jnp.clip(jnp.sum(pu * (qp - qn), -1), -80.0, 1e8)
            return jnp.sum(jnp.logaddexp(0.0, -diff))

        # sharded_lookup's VJP already psums the table cotangents over
        # "data" (it must, to satisfy the vma checker) — grads here are the
        # fully-reduced data-parallel gradients, no further psum
        gP, gQ = jax.grad(loss_fn)((P_shard, Q_shard))

        if eps > 0.0:
            dP = eps * row_normalize_local(gP)
            dQ = eps * row_normalize_local(gQ)

            def adv_loss_fn(tables):
                Pl, Ql = tables
                pu = sharded_lookup(Pl + dP, users)
                qp = sharded_lookup(Ql + dQ, pos)
                qn = sharded_lookup(Ql + dQ, neg)
                diff = jnp.clip(jnp.sum(pu * (qp - qn), -1), -80.0, 1e8)
                return jnp.sum(jnp.logaddexp(0.0, -diff))

            ag = jax.grad(adv_loss_fn)((P_shard, Q_shard))
            gP = gP + reg_adv * ag[0]
            gQ = gQ + reg_adv * ag[1]

        return P_shard - lr * gP, Q_shard - lr * gQ

    from jax import shard_map

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("model", None), P("model", None),
                  P("data"), P("data"), P("data")),
        out_specs=(P("model", None), P("model", None)),
    ))


def make_sharded_sasrec_step(mesh: Mesh, model, lr: float = 1e-3):
    """Explicit shard_map adversarial SASRec step: the item-embedding table
    row-sharded over "model" (``sharded_lookup`` psum assembly + local
    scatter-add backward), encoder weights replicated, batch sharded over
    "data".

    Semantics per reference ``asasrec`` (SASRec.py:356-363): FGSM delta on
    the item table only, from the no-dropout clean loss; the adversarial
    term perturbs the *target* embeddings against the clean sequence
    representation. Row normalization is shard-local (rows are never split).
    Loss is sum-reduced and the update is SGD — this is the
    explicit-collectives reference implementation and multi-chip dry-run
    target; the production path is the GSPMD-jitted trainer with dropout
    and Adam.
    """
    import math

    d = model.dim
    eps, reg_adv = model.eps, model.reg_adv
    adversarial = model.adversarial

    def pointwise_sum_loss(reprs, pos_e, neg_e, ist):
        pos_logit = jnp.sum(pos_e * reprs, -1)
        neg_logit = jnp.sum(neg_e * reprs, -1)
        return (jnp.sum(jnp.logaddexp(0.0, -pos_logit) * ist)
                + jnp.sum(jnp.logaddexp(0.0, neg_logit) * ist))

    def step(item_shard, rest, seq, pos, neg):
        b, t = seq.shape
        ist = (pos != 0).astype(jnp.float32)

        def lookup(tbl, ids):
            return sharded_lookup(tbl, ids.reshape(-1)).reshape(b, t, d)

        def encode(rp, x):
            # plain-jnp encoder math, NOT encode_core: the fused Pallas
            # kernel can't trace under shard_map's vma tracking (and this
            # path is the explicit-collectives reference, kept simple).
            # Honors the model's train-path compute dtype (f32 default,
            # bf16 opt-in via train_dtype).
            return model.encode_math(rp, x, seq != 0, None,
                                     dtype=model._compute_dtype())

        def clean_loss(tables):
            item_local, rp = tables
            x = lookup(item_local, seq) * math.sqrt(d)
            reprs = encode(rp, x)
            return pointwise_sum_loss(reprs, lookup(item_local, pos),
                                      lookup(item_local, neg), ist)

        # NO explicit gradient reduction anywhere: replicated (P()) params
        # get their "data" psum from the transpose of the automatic
        # invariant→varying promotion, and the item shard's gradient comes
        # through sharded_lookup's custom VJP, whose bwd rule performs the
        # "data" psum itself (required to satisfy the vma checker).
        g_item, g_rest = jax.grad(clean_loss)((item_shard, rest))

        if adversarial:
            delta_local = jax.lax.stop_gradient(
                eps * row_normalize_local(g_item))

            def adv_loss(tables):
                item_local, rp = tables
                x = lookup(item_local, seq) * math.sqrt(d)
                reprs = encode(rp, x)
                tgt = item_local + delta_local
                return pointwise_sum_loss(reprs, lookup(tgt, pos),
                                          lookup(tgt, neg), ist)

            ag_item, ag_rest = jax.grad(adv_loss)((item_shard, rest))
            g_item = g_item + reg_adv * ag_item
            g_rest = jax.tree.map(lambda g, ag: g + reg_adv * ag,
                                  g_rest, ag_rest)

        new_item = item_shard - lr * g_item
        new_rest = jax.tree.map(lambda p, g: p - lr * g, rest, g_rest)
        return new_item, new_rest

    from jax import shard_map

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("model", None), P(), P("data", None), P("data", None),
                  P("data", None)),
        out_specs=(P("model", None), P()),
    ))
