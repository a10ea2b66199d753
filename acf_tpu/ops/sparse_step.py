"""Fully sparse APR/BPR training step: no dense full-table work per step.

The generic trainer differentiates through the embedding gathers, which
materializes dense [U, d]/[I, d] gradient tables, and Adagrad then reads and
writes every row of params + accumulators each step — for MF models the
per-step HBM traffic is ~6 full tables regardless of batch size.

This step keeps everything in *row space*:

  * gradients are taken wrt the gathered rows [B, d] (closed under autodiff);
  * duplicates are aggregated per unique id. Two interchangeable programs
    (``dedup="auto"`` default picks by batch size): ``"sort"`` uses
    ``jnp.unique`` (static size under jit) + a batch-sized scatter-add;
    ``"matmul"`` is sort-free — an equality matrix
    ``eq[i,j] = ids[i]==ids[j]`` gives first-occurrence flags via
    ``argmax`` and aggregates duplicate gradients as one [B,B]x[B,d]
    matmul on the MXU, so the hot path has no sort, no data-dependent
    scatter-add, and no serialized lane shuffles — but the equality
    matrices are O(B²), so "auto" switches to "sort" above 4k batch;
  * Adagrad reads/writes only the touched rows (`.at[ids]` gather/scatter),
    reproducing ``optax.adagrad`` exactly (acc += g²; Δ = g·rsqrt(acc+eps));
  * the FGSM delta is computed in row space too — mathematically identical
    to the dense formulation (evaluation_adv.py:192-203) because untouched
    rows have zero gradient and zero delta.

Per-step HBM traffic drops from O(|U|·d + |I|·d) to O(B·d).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from acf_tpu.models.base import bpr_pair_loss, row_normalize
from acf_tpu.models.mf import MFBPR
from acf_tpu.sampling.negatives import sample_pair_epoch, uniform_negatives


@dataclasses.dataclass(eq=False)
class SparseMFBPR(MFBPR):
    """MFBPR with the sparse epoch program. Pass any optax optimizer to the
    Trainer — it is ignored; the step implements Adagrad(lr, init_acc)
    matching the reference (evaluation_adv.py:205-207)."""

    lr: float = 0.05
    initial_acc: float = 0.1
    opt_eps: float = 1e-7  # optax.adagrad eps
    # 'matmul': sort-free MXU aggregation — fastest at bs <= ~4k but its
    # equality matrices are O(B²) memory ([2B,2B] f32 ≈ 1 GB at bs 8192);
    # 'sort': jnp.unique, O(B log B); 'auto' picks by batch size.
    dedup: str = "auto"

    def init_opt_state(self, optimizer, params):
        return {
            "accP": jnp.full_like(params["P"], self.initial_acc),
            "accQ": jnp.full_like(params["Q"], self.initial_acc),
        }

    def make_epoch_fn(self, optimizer, batch_size: int, num_batches: int,
                      dev=None, mesh=None):
        if mesh is not None:
            # the row-space step hand-schedules touched-row gathers/scatters
            # and its own Adagrad slot math — under GSPMD those scatters
            # would run replicated, not sharded. Refuse loudly rather than
            # training a silently-unsharded program (the dense MFBPR path
            # supports TrainConfig.mesh and wins at reference-scale tables
            # anyway — docs/ROADMAP.md).
            raise NotImplementedError(
                "SparseMFBPR does not support TrainConfig.mesh; use the "
                "dense MFBPR/APR path for mesh training")
        b = batch_size
        lr, eps_opt = self.lr, self.opt_eps

        def rows_bpr(pu, qp, qn):
            pos = jnp.sum(pu * qp, -1)
            neg = jnp.sum(pu * qn, -1)
            return bpr_pair_loss(pos, neg), (pos, neg)

        def rows_opt_loss(pu, qp, qn, d_pu, d_qp, d_qn):
            loss, (pos_s, neg_s) = rows_bpr(pu, qp, qn)
            reg_term = jnp.mean(jnp.square(pu) + jnp.square(qp)
                                + jnp.square(qn))
            total = loss + self.reg * reg_term
            acc = jnp.mean((pos_s - neg_s) > 0)
            aux = {"loss": loss, "acc": acc}
            if self.adversarial:
                adv, (pos_a, neg_a) = rows_bpr(pu + d_pu, qp + d_qp,
                                               qn + d_qn)
                total = total + self.reg_adv * adv + self.reg * reg_term
                aux["acc_adv"] = jnp.mean((pos_a - neg_a) > 0)
            return total, aux

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(key)
            n = data["pairs_u"].shape[0]
            batches = sample_pair_epoch(k_perm, n, b, num_batches)
            step_keys = jax.random.split(k_steps, num_batches)

            def dedup_sort(ids, size):
                """jnp.unique program → (scatter ids, optimizer-space agg,
                per-example FGSM delta rows)."""
                uu, inv = jnp.unique(ids, size=size, fill_value=0,
                                     return_inverse=True)

                def agg(g):  # [N, d] example-grads → unique-slot grads
                    return jnp.zeros((size, g.shape[-1])).at[inv].add(g)

                def delta_rows(g, eps):
                    return (eps * row_normalize(agg(g)))[inv]

                return uu, agg, delta_rows

            def dedup_matmul(ids, size):
                """Sort-free program: duplicate aggregation as one MXU
                matmul over the equality matrix ``eq[i,j]=ids[i]==ids[j]``
                — every row of ``eq @ g`` is its duplicate-group's sum, so
                (a) FGSM deltas normalize those rows directly, no
                example→slot gather, and (b) optimizer updates keep only
                first occurrences (argmax flags), scattering duplicates to
                pad row 0 with a zero payload so row 0 stays bit-identical.
                HIGHEST precision: the default TPU matmul truncates the
                f32 gradients to bf16, breaking dense-trajectory parity."""
                eq = (ids[:, None] == ids[None, :])
                is_first = (jnp.argmax(eq, axis=1)
                            == jnp.arange(size))[:, None]
                su = jnp.where(is_first[:, 0], ids, 0)
                eq_f = eq.astype(jnp.float32)

                def group_sum(g):
                    return jnp.dot(eq_f, g,
                                   precision=jax.lax.Precision.HIGHEST)

                def agg(g):
                    return jnp.where(is_first, group_sum(g), 0.0)

                def delta_rows(g, eps):
                    return eps * row_normalize(group_sum(g))

                return su, agg, delta_rows

            mode = self.dedup
            if mode == "auto":
                mode = "matmul" if b <= 4096 else "sort"
            dedup = dedup_matmul if mode == "matmul" else dedup_sort

            def step(c, xs):
                prm, opt = c
                idx, kk = xs
                kn, _ = jax.random.split(kk)
                u = data["pairs_u"][idx]
                pos = data["pairs_i"][idx]
                neg = uniform_negatives(kn, data["hist"][u], self.num_items)

                pu = prm["P"][u]
                qp = prm["Q"][pos]
                qn = prm["Q"][neg]

                # touched-row views (pad id 0 never collides with real ids)
                items = jnp.concatenate([pos, neg])
                uu, agg_u, delta_u = dedup(u, b)
                ii, agg_i, delta_i = dedup(items, 2 * b)

                if self.adversarial:
                    # FGSM deltas from the clean loss, in row space
                    gc_pu, gc_qp, gc_qn = jax.grad(
                        lambda a, p_, n_: rows_bpr(a, p_, n_)[0],
                        argnums=(0, 1, 2))(pu, qp, qn)
                    d_pu = jax.lax.stop_gradient(delta_u(gc_pu, self.eps))
                    d_qi = jax.lax.stop_gradient(delta_i(
                        jnp.concatenate([gc_qp, gc_qn]), self.eps))
                    d_qp, d_qn = d_qi[:b], d_qi[b:]
                else:
                    d_pu = d_qp = d_qn = jnp.zeros_like(pu)

                (_, aux), (g_pu, g_qp, g_qn) = jax.value_and_grad(
                    rows_opt_loss, argnums=(0, 1, 2), has_aux=True)(
                    pu, qp, qn, d_pu, d_qp, d_qn)

                gP = agg_u(g_pu)                     # [B, d] rows for uu
                gQ = agg_i(jnp.concatenate([g_qp, g_qn]))  # [2B, d] for ii

                # sparse Adagrad (optax semantics) on touched rows only;
                # duplicate slots carry gP=0 at id 0 → acc/param no-ops.
                # acc writes are scatter-ADDs (set(acc[rows]+g²) ≡ add(g²)
                # at unique rows) so XLA can update every buffer in place.
                accP_rows = opt["accP"][uu] + jnp.square(gP)
                P = prm["P"].at[uu].add(
                    -lr * gP * jax.lax.rsqrt(accP_rows + eps_opt))
                accP = opt["accP"].at[uu].add(jnp.square(gP))

                accQ_rows = opt["accQ"][ii] + jnp.square(gQ)
                Q = prm["Q"].at[ii].add(
                    -lr * gQ * jax.lax.rsqrt(accQ_rows + eps_opt))
                accQ = opt["accQ"].at[ii].add(jnp.square(gQ))

                return ({"P": P, "Q": Q}, {"accP": accP, "accQ": accQ}), aux

            (params, opt_state), auxes = jax.lax.scan(
                step, (params, opt_state), (batches, step_keys))
            return (params, opt_state), jax.tree.map(jnp.mean, auxes)

        return epoch_fn
