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

**Mesh composition (round 5).** With ``TrainConfig.mesh`` the same
row-space program runs under ``shard_map`` with P/Q (and their Adagrad
slots) row-sharded over the "model" axis — the genuinely-huge-catalog
multi-chip case (a 10M x 64 table is 2.5 GB + 2.5 GB of slots; two of
v5e's 16 GB HBM just for MF state). Per step, each device

  * assembles the gathered [B, d] rows with the same psum-of-masked-rows
    exchange as ``parallel/sharded_embedding.sharded_lookup`` (B·d bytes
    over ICI per table read);
  * runs the *identical* full-batch row-space math (grads, dedup, FGSM
    normalize — rows are never split across devices, so normalization
    stays shard-local, and full-batch dedup keeps Adagrad's
    sum-then-square semantics exact);
  * scatters updates ONLY into its own row window (mask + clip, zero
    payload off-shard — same scheme as the sharded lookup backward).

The batch itself is replicated over the mesh (the row-space math is
O(B·d), negligible next to the table-scaling goal), so the scaling axis
for this step is "model": use ``--mesh 1xN``. Trajectories are
bit-compatible with the single-device sparse step
(tests/test_parallel.py::test_sparse_step_mesh_matches_single_device).
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

        def row_space_grads(u, pos, neg, pu, qp, qn):
            """Shared row-space core (single-device AND mesh paths): FGSM
            deltas + optimizer grads on the gathered rows, aggregated per
            unique id over the FULL batch. Returns
            ``(uu [B], gP [B, d], ii [2B], gQ [2B, d], aux)`` where gP/gQ
            rows align with uu/ii (duplicates carry id 0 + zero grad)."""
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

            gP = agg_u(g_pu)                       # [B, d] rows for uu
            gQ = agg_i(jnp.concatenate([g_qp, g_qn]))  # [2B, d] for ii
            return uu, gP, ii, gQ, aux

        if mesh is not None:
            return self._make_mesh_epoch_fn(mesh, b, num_batches,
                                            row_space_grads)

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(key)
            n = data["pairs_u"].shape[0]
            batches = sample_pair_epoch(k_perm, n, b, num_batches)
            step_keys = jax.random.split(k_steps, num_batches)

            def step(c, xs):
                prm, opt = c
                idx, kk = xs
                kn, _ = jax.random.split(kk)
                u = data["pairs_u"][idx]
                pos = data["pairs_i"][idx]
                neg = uniform_negatives(kn, data["hist"][u], self.num_items)

                # touched-row views (pad id 0 never collides with real ids)
                pu = prm["P"][u]
                qp = prm["Q"][pos]
                qn = prm["Q"][neg]
                uu, gP, ii, gQ, aux = row_space_grads(u, pos, neg,
                                                      pu, qp, qn)

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

    # ------------------------------------------------------------------
    def _make_mesh_epoch_fn(self, mesh, b, num_batches, row_space_grads):
        """Row-space step with P/Q + Adagrad slots row-sharded over
        "model" (see module docstring). Structure per step:

          lookup  = psum of masked local gathers (sharded_lookup — the
                    same collective as parallel/sharded_embedding.py);
          math    = identical full-batch row-space core, replicated;
          update  = local-window masked scatter into this device's rows.

        Tables are padded to a multiple of the axis size per EPOCH (one
        O(table) pad + unpad amortized over all steps — the per-step
        traffic stays O(B·d))."""
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from acf_tpu.parallel.sharded_embedding import (
            _local_window, sharded_lookup,
        )

        lr, eps_opt = self.lr, self.opt_eps
        m = mesh.shape["model"]
        tspec = NamedSharding(mesh, P("model", None))
        rspec = NamedSharding(mesh, P())

        def local_adagrad(tbl, acc, rows, g):
            """Adagrad on the rows of this shard's window; off-shard rows
            (and the duplicate slots dedup parked at id 0 on shards > 0)
            clip into the window with a ZERO payload, so every table stays
            bit-identical to the single-device scatter."""
            lidx, ok = _local_window(tbl.shape[0], rows, "model")
            okf = ok[:, None]
            g = jnp.where(okf, g, 0.0)
            acc_rows = acc[lidx] + jnp.square(g)
            upd = jnp.where(okf, -lr * g * jax.lax.rsqrt(acc_rows + eps_opt),
                            0.0)
            return tbl.at[lidx].add(upd), acc.at[lidx].add(jnp.square(g))

        def shard_scan(Psh, accPsh, Qsh, accQsh, pairs_u, pairs_i, hist,
                       batches, step_keys):
            def step(c, xs):
                Pl, aPl, Ql, aQl = c
                idx, kk = xs
                kn, _ = jax.random.split(kk)
                u = pairs_u[idx]
                pos = pairs_i[idx]
                neg = uniform_negatives(kn, hist[u], self.num_items)

                pu = sharded_lookup(Pl, u)
                qp = sharded_lookup(Ql, pos)
                qn = sharded_lookup(Ql, neg)
                uu, gP, ii, gQ, aux = row_space_grads(u, pos, neg,
                                                      pu, qp, qn)

                Pl, aPl = local_adagrad(Pl, aPl, uu, gP)
                Ql, aQl = local_adagrad(Ql, aQl, ii, gQ)
                return (Pl, aPl, Ql, aQl), aux

            carry, auxes = jax.lax.scan(
                step, (Psh, accPsh, Qsh, accQsh), (batches, step_keys))
            return carry + (jax.tree.map(jnp.mean, auxes),)

        inner = shard_map(
            shard_scan, mesh=mesh,
            in_specs=(P("model", None),) * 4 + (P(),) * 5,
            out_specs=(P("model", None),) * 4 + (P(),))

        def pad_rows(x):
            p = (-x.shape[0]) % m
            return jnp.pad(x, ((0, p), (0, 0))) if p else x

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt = carry
            U, I = params["P"].shape[0], params["Q"].shape[0]
            place = lambda x: jax.lax.with_sharding_constraint(
                pad_rows(x), tspec)
            Psh, Qsh = place(params["P"]), place(params["Q"])
            aPsh, aQsh = place(opt["accP"]), place(opt["accQ"])

            k_perm, k_steps = jax.random.split(key)
            n = data["pairs_u"].shape[0]
            batches = sample_pair_epoch(k_perm, n, b, num_batches)
            step_keys = jax.random.split(k_steps, num_batches)

            Psh, aPsh, Qsh, aQsh, aux = inner(
                Psh, aPsh, Qsh, aQsh, data["pairs_u"], data["pairs_i"],
                data["hist"],
                jax.lax.with_sharding_constraint(batches, rspec),
                jax.lax.with_sharding_constraint(step_keys, rspec))
            return ({"P": Psh[:U], "Q": Qsh[:I]},
                    {"accP": aPsh[:U], "accQ": aQsh[:I]}), aux

        return epoch_fn
