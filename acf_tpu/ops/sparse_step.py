"""Fully sparse APR/BPR training step: no dense full-table work per step.

The generic trainer differentiates through the embedding gathers, which
materializes dense [U, d]/[I, d] gradient tables, and Adagrad then reads and
writes every row of params + accumulators each step — for MF models the
per-step HBM traffic is ~6 full tables regardless of batch size.

This step keeps everything in *row space*:

  * gradients are taken wrt the gathered rows [B, d] (closed under autodiff);
  * duplicates are aggregated per unique id with a batch-sized scatter-add
    (``jnp.unique`` with a static size under jit);
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

    def init_opt_state(self, optimizer, params):
        return {
            "accP": jnp.full_like(params["P"], self.initial_acc),
            "accQ": jnp.full_like(params["Q"], self.initial_acc),
        }

    def make_epoch_fn(self, optimizer, batch_size: int, num_batches: int,
                      dev=None):
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
            if self.adversarial:
                adv, _ = rows_bpr(pu + d_pu, qp + d_qp, qn + d_qn)
                total = total + self.reg_adv * adv + self.reg * reg_term
            acc = jnp.mean((pos_s - neg_s) > 0)
            return total, {"loss": loss, "acc": acc}

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

                pu = prm["P"][u]
                qp = prm["Q"][pos]
                qn = prm["Q"][neg]

                # unique-id views (pad id 0 never collides with real ids)
                uu, inv_u = jnp.unique(u, size=b, fill_value=0,
                                       return_inverse=True)
                items = jnp.concatenate([pos, neg])
                ii, inv_i = jnp.unique(items, size=2 * b, fill_value=0,
                                       return_inverse=True)

                def agg_u(g):  # [B, d] example-grads → unique-row grads
                    return jnp.zeros((b, g.shape[-1])).at[inv_u].add(g)

                def agg_i(g2):  # [2B, d]
                    return jnp.zeros((2 * b, g2.shape[-1])).at[inv_i].add(g2)

                if self.adversarial:
                    # FGSM deltas from the clean loss, in row space
                    gc_pu, gc_qp, gc_qn = jax.grad(
                        lambda a, p_, n_: rows_bpr(a, p_, n_)[0],
                        argnums=(0, 1, 2))(pu, qp, qn)
                    dP_rows = self.eps * row_normalize(agg_u(gc_pu))
                    dQ_rows = self.eps * row_normalize(
                        agg_i(jnp.concatenate([gc_qp, gc_qn])))
                    d_pu = jax.lax.stop_gradient(dP_rows[inv_u])
                    d_qp = jax.lax.stop_gradient(dQ_rows[inv_i[:b]])
                    d_qn = jax.lax.stop_gradient(dQ_rows[inv_i[b:]])
                else:
                    d_pu = d_qp = d_qn = jnp.zeros_like(pu)

                (_, aux), (g_pu, g_qp, g_qn) = jax.value_and_grad(
                    rows_opt_loss, argnums=(0, 1, 2), has_aux=True)(
                    pu, qp, qn, d_pu, d_qp, d_qn)

                gP = agg_u(g_pu)                     # [B, d] rows for uu
                gQ = agg_i(jnp.concatenate([g_qp, g_qn]))  # [2B, d] for ii

                # sparse Adagrad (optax semantics) on touched rows only
                accP_rows = opt["accP"][uu] + jnp.square(gP)
                P = prm["P"].at[uu].add(
                    -lr * gP * jax.lax.rsqrt(accP_rows + eps_opt))
                accP = opt["accP"].at[uu].set(accP_rows)

                accQ_rows = opt["accQ"][ii] + jnp.square(gQ)
                Q = prm["Q"].at[ii].add(
                    -lr * gQ * jax.lax.rsqrt(accQ_rows + eps_opt))
                accQ = opt["accQ"].at[ii].set(accQ_rows)

                return ({"P": P, "Q": Q}, {"accP": accP, "accQ": accQ}), aux

            (params, opt_state), auxes = jax.lax.scan(
                step, (params, opt_state), (batches, step_keys))
            return (params, opt_state), jax.tree.map(jnp.mean, auxes)

        return epoch_fn
