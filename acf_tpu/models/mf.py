"""Matrix-factorization models: MF-BPR and its APR adversarial variant, plus
pointwise MF.

``MFBPR`` re-implements the reference's canonical APR machinery — the raw-TF
``MF`` graph class (reference evaluation_adv.py:97-214 / APR.py:85-203) — as a
pure JAX model. The adversarial (APR) path fuses the reference's two
``sess.run`` round-trips per step (``update_P/update_Q`` then ``optimizer``,
evaluation_adv.py:345-347) into ONE jitted loss: the FGSM delta is a second
gradient under ``stop_gradient``, so XLA compiles clean-loss + delta +
adversarial-loss + backward into a single fused step.

``PointwiseMF`` is the Keras ``MatrixFactorization`` (reference MF.py:7-59):
dot-product scores with a sigmoid binary cross-entropy over 1 sampled
negative per positive.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from acf_tpu.models.base import (
    PairwiseModel, bpr_pair_loss, project_rows, row_normalize,
)


def _trunc_normal(key, shape, std=0.01):
    """tf.truncated_normal semantics: normal(0, std) truncated at 2 std."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


@dataclasses.dataclass(eq=False)
class MFBPR(PairwiseModel):
    """MF with BPR loss; APR (FGSM on embedding rows) when ``adversarial``.

    Hyperparameter defaults follow the reference CLI (run_adv.py:15-54):
    Adagrad(lr=0.05), reg=0, eps=0.5, reg_adv=1.
    """

    reg: float = 0.0
    adversarial: bool = False
    eps: float = 0.5
    reg_adv: float = 1.0
    adv_mode: str = "grad"  # "grad" (FGSM) or "random" (evaluation_adv.py:182-189)
    init_std: float = 0.01
    dns: int = 1  # >1 = hardest-of-k dynamic negative sampling
                  # (reference evaluation_adv.py:349-367)
    adv_steps: int = 1  # >1 = multi-step (PGD-style) perturbation: iterate
                        # grad-at-perturbed-point → ε·normalize, an extension
                        # beyond the reference's single FGSM step (MSAP,
                        # arXiv:2010.01329)
    # manual_grads aggregates duplicate rows with [B,B]/[2B,2B] equality
    # matrices on the MXU — O(B²) memory ([2B,2B] f32 ≈ 1 GB at B=8192), so
    # past this batch size the trainer falls back to autodiff (same gate as
    # SparseMFBPR's dedup="auto")
    manual_grads_max_batch: int = 4096

    def init_params(self, key):
        kp, kq = jax.random.split(key)
        return {
            "P": _trunc_normal(kp, (self.num_users, self.dim), self.init_std),
            "Q": _trunc_normal(kq, (self.num_items, self.dim), self.init_std),
        }

    # -- scoring ------------------------------------------------------------
    def _pair_scores(self, params, users, items, dP=None, dQ=None):
        p = params["P"][users]
        q = params["Q"][items]
        if dP is not None:
            p = p + dP[users]
            q = q + dQ[items]
        return jnp.sum(p * q, axis=-1), p, q

    def score_all(self, params, users, hists):
        return params["P"][users] @ params["Q"].T

    def score_some(self, params, users, hists, items):
        p = params["P"][users]  # [B, d]
        q = params["Q"][items]  # [B, M, d]
        return jnp.einsum("bd,bmd->bm", p, q)


    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                return params["P"][users]

            def table(params):
                return params["Q"], None

            self._fs = (user_repr, table)
        return self._fs
    # -- training loss ------------------------------------------------------
    def _clean_loss(self, params, users, pos, neg):
        pos_s, p, qp = self._pair_scores(params, users, pos)
        neg_s, _, qn = self._pair_scores(params, users, neg)
        loss = bpr_pair_loss(pos_s, neg_s)
        reg_term = jnp.mean(jnp.square(p) + jnp.square(qp) + jnp.square(qn))
        acc = jnp.mean((pos_s - neg_s) > 0)
        return loss, reg_term, acc

    def fgsm_deltas(self, params, users, pos, neg, key=None):
        """Perturbation tables for the adversarial objective.

        ``adv_steps=1`` (reference semantics, evaluation_adv.py:192-203):
        ε-scaled row-normalized gradient of the *clean* BPR loss wrt the full
        embedding tables. Rows outside the batch have zero gradient and
        therefore zero delta.

        ``adv_steps>1`` extends this to PGD-style multi-step perturbations
        (MSAP, arXiv:2010.01329): ``adv_steps`` iterations of step size
        ε/adv_steps, each taking the gradient AT the perturbed point, with
        per-row projection back into the ε-ball. At adv_steps=1 this reduces
        exactly to the reference's single FGSM step.
        """
        if self.adv_mode == "random":
            kp, kq = jax.random.split(key)
            gP = _trunc_normal(kp, params["P"].shape, 0.01)
            gQ = _trunc_normal(kq, params["Q"].shape, 0.01)
            return (self.eps * row_normalize(jax.lax.stop_gradient(gP)),
                    self.eps * row_normalize(jax.lax.stop_gradient(gQ)))

        def clean_at(prm, dP, dQ):
            pos_s, _, _ = self._pair_scores(prm, users, pos, dP, dQ)
            neg_s, _, _ = self._pair_scores(prm, users, neg, dP, dQ)
            return bpr_pair_loss(pos_s, neg_s)

        def project(d):
            return project_rows(d, self.eps)

        alpha = self.eps / self.adv_steps
        dP = jnp.zeros_like(params["P"])
        dQ = jnp.zeros_like(params["Q"])
        for _ in range(self.adv_steps):
            g = jax.grad(clean_at)(params, dP, dQ)
            dP = project(dP + alpha * row_normalize(
                jax.lax.stop_gradient(g["P"])))
            dQ = project(dQ + alpha * row_normalize(
                jax.lax.stop_gradient(g["Q"])))
        return dP, dQ

    # -- handwritten fused step gradients ------------------------------------
    @property
    def manual_grads(self):
        """Closed-form gradient function for the APR step, or None.

        The autodiff APR step pays ~6 row scatter-adds per step: the inner
        ``jax.grad(clean)`` materializes two dense delta-source tables
        (evaluation_adv.py:195-199 semantics) and the outer backward scatters
        clean- and adversarial-loss row grads separately. For MF-BPR every
        gradient row has a closed form, and duplicate-row aggregation (what
        the dense scatter provides for the FGSM normalize) is an exact
        equality-matrix matmul on the MXU. This path emits exactly ONE
        scatter-add per table and no dense intermediates.

        Only defined for the reference configuration (grad-mode single-step
        FGSM); other modes fall back to autodiff.
        """
        if (self.adversarial and self.adv_mode == "grad"
                and self.adv_steps == 1):
            return self._apr_manual_grads
        return None

    def _apr_manual_grads(self, params, batch, key):
        users, pos, neg = batch
        B = users.shape[0]
        d = self.dim
        hp = jax.lax.Precision.HIGHEST

        p = params["P"][users]
        qp = params["Q"][pos]
        qn = params["Q"][neg]

        # clean BPR: L = sum softplus(-(clip(s+ - s-))); dL/ddiff = -sigmoid(-diff)
        diff = jnp.sum(p * (qp - qn), -1)
        diff_c = jnp.clip(diff, -80.0, 1e8)
        in_range = ((diff >= -80.0) & (diff <= 1e8)).astype(jnp.float32)
        c = -jax.nn.sigmoid(-diff_c) * in_range  # [B]
        loss = jnp.sum(jnp.logaddexp(0.0, -diff_c))
        acc = jnp.mean((diff > 0))

        # per-occurrence clean grad rows of L wrt P/Q
        gp_rows = c[:, None] * (qp - qn)                     # dL/dP[u_b]
        gq_rows = jnp.concatenate([c[:, None] * p,
                                   -c[:, None] * p], axis=0)  # pos then neg

        # FGSM deltas need the *row-aggregated* clean grad (duplicate batch
        # slots of one table row share a single summed gradient,
        # evaluation_adv.py:192-203). Aggregate with exact 0/1 equality
        # matrices on the MXU instead of a dense scatter+gather.
        eq_u = (users[:, None] == users[None, :]).astype(jnp.float32)
        agg_p = jnp.matmul(eq_u, gp_rows, precision=hp)
        items2 = jnp.concatenate([pos, neg], axis=0)
        eq_i = (items2[:, None] == items2[None, :]).astype(jnp.float32)
        agg_q = jnp.matmul(eq_i, gq_rows, precision=hp)

        dP = self.eps * row_normalize(agg_p)        # [B, d] rows for u
        dQp = self.eps * row_normalize(agg_q[:B])   # rows for pos
        dQn = self.eps * row_normalize(agg_q[B:])   # rows for neg

        # adversarial pair loss at the perturbed point
        ph = p + dP
        qph = qp + dQp
        qnh = qn + dQn
        diff_a = jnp.sum(ph * (qph - qnh), -1)
        diff_ac = jnp.clip(diff_a, -80.0, 1e8)
        in_range_a = ((diff_a >= -80.0) & (diff_a <= 1e8)).astype(jnp.float32)
        ca = -jax.nn.sigmoid(-diff_ac) * in_range_a
        loss_adv = jnp.sum(jnp.logaddexp(0.0, -diff_ac))
        acc_adv = jnp.mean((diff_a > 0))

        # total row grads: clean + reg_adv * adversarial (+ the doubled reg
        # term, evaluation_adv.py:175-177 — R = mean(p^2+qp^2+qn^2) twice)
        rcoef = 4.0 * self.reg / (B * d)
        rowsP = gp_rows + (self.reg_adv * ca)[:, None] * (qph - qnh)
        rowsQ = gq_rows + jnp.concatenate(
            [(self.reg_adv * ca)[:, None] * ph,
             -(self.reg_adv * ca)[:, None] * ph], axis=0)
        if self.reg != 0.0:
            rowsP = rowsP + rcoef * p
            rowsQ = rowsQ + rcoef * jnp.concatenate([qp, qn], axis=0)

        grads = {
            "P": jnp.zeros_like(params["P"]).at[users].add(rowsP),
            "Q": jnp.zeros_like(params["Q"]).at[items2].add(rowsQ),
        }
        aux = {"loss": loss, "acc": acc,
               "loss_adv": loss_adv, "acc_adv": acc_adv}
        return grads, aux

    def adv_target_loss(self, params, batch, key):
        """FGSM linearization target: the raw BPR loss WITHOUT the reg term
        (the reference's delta is grad of ``self.loss``, the pre-reg pairwise
        loss, evaluation_adv.py:162 vs 192-203)."""
        users, pos, neg = batch
        loss, _, _ = self._clean_loss(params, users, pos, neg)
        return loss

    def adv_encoders(self):
        """Embedding towers for the popularity-discriminator machinery
        (AdversarialBPR discriminates on the user and pos-item embeddings,
        reference BPR.py:112-123)."""
        d = self.dim
        return {
            "u": ("user", lambda p, ids: p["P"][ids], d),
            "i": ("item", lambda p, ids: p["Q"][ids], d),
        }

    def loss(self, params, batch, key):
        users, pos, neg = batch
        loss, reg_term, acc = self._clean_loss(params, users, pos, neg)
        opt_loss = loss + self.reg * reg_term
        aux = {"loss": loss, "acc": acc}
        if self.adversarial:
            if self.adv_mode == "grad" and self.adv_steps == 1:
                # hot path: gather-then-normalize instead of materializing
                # two full delta tables — row_normalize commutes with the
                # row gather, so the perturbed scores are identical to
                # indexing fgsm_deltas() tables while skipping two
                # table-sized writes + reads per step
                def clean(prm):
                    pos_s, _, _ = self._pair_scores(prm, users, pos)
                    neg_s, _, _ = self._pair_scores(prm, users, neg)
                    return bpr_pair_loss(pos_s, neg_s)

                g = jax.lax.stop_gradient(jax.grad(clean)(params))
                dPu = self.eps * row_normalize(g["P"][users])
                dQp = self.eps * row_normalize(g["Q"][pos])
                dQn = self.eps * row_normalize(g["Q"][neg])
                pos_a = jnp.sum((params["P"][users] + dPu)
                                * (params["Q"][pos] + dQp), -1)
                neg_a = jnp.sum((params["P"][users] + dPu)
                                * (params["Q"][neg] + dQn), -1)
            else:
                dP, dQ = self.fgsm_deltas(params, users, pos, neg, key)
                pos_a, _, _ = self._pair_scores(params, users, pos, dP, dQ)
                neg_a, _, _ = self._pair_scores(params, users, neg, dP, dQ)
            loss_adv = bpr_pair_loss(pos_a, neg_a)
            # The reference adds the clean-embedding reg term a second time
            # (evaluation_adv.py:175-177 reuses the clean lookups).
            opt_loss = opt_loss + self.reg_adv * loss_adv + self.reg * reg_term
            aux["loss_adv"] = loss_adv
            # pairwise acc under perturbed embeddings — the epoch line's
            # ACC_adv (evaluation_adv.py:398-399 on output_adv)
            aux["acc_adv"] = jnp.mean((pos_a - neg_a) > 0)
        return opt_loss, aux


@dataclasses.dataclass(eq=False)
class PointwiseMF(PairwiseModel):
    """Keras-style pointwise MF (reference MF.py:7-59): sigmoid(u·i) with
    binary cross-entropy; the trainer feeds (user, pos, neg) and the loss
    treats pos as label-1 and neg as label-0 (MF.py:42-56 emits exactly one
    sampled negative per positive)."""

    init_scale: float = 0.05  # keras Embedding default: uniform(-0.05, 0.05)

    def init_params(self, key):
        kp, kq = jax.random.split(key)
        return {
            "P": jax.random.uniform(kp, (self.num_users, self.dim),
                                    jnp.float32, -self.init_scale, self.init_scale),
            "Q": jax.random.uniform(kq, (self.num_items, self.dim),
                                    jnp.float32, -self.init_scale, self.init_scale),
        }

    def score_all(self, params, users, hists):
        return params["P"][users] @ params["Q"].T

    def score_some(self, params, users, hists, items):
        return jnp.einsum("bd,bmd->bm", params["P"][users], params["Q"][items])


    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                return params["P"][users]

            def table(params):
                return params["Q"], None

            self._fs = (user_repr, table)
        return self._fs
    def adv_encoders(self):
        """AMF discriminates on the raw user/item tables
        (reference MF.py:80-98)."""
        d = self.dim
        return {
            "u": ("user", lambda p, ids: p["P"][ids], d),
            "i": ("item", lambda p, ids: p["Q"][ids], d),
        }

    def loss(self, params, batch, key):
        users, pos, neg = batch
        pos_s = jnp.sum(params["P"][users] * params["Q"][pos], -1)
        neg_s = jnp.sum(params["P"][users] * params["Q"][neg], -1)
        # mean BCE over the 2B pointwise examples
        logits = jnp.concatenate([pos_s, neg_s])
        labels = jnp.concatenate([jnp.ones_like(pos_s), jnp.zeros_like(neg_s)])
        bce = jnp.logaddexp(0.0, logits) - labels * logits
        loss = jnp.mean(bce)
        acc = jnp.mean((pos_s - neg_s) > 0)
        return loss, {"loss": loss, "acc": acc}
