"""Generic FGSM/PGD adversarial-training wrapper for any zoo model.

The reference implements embedding-space adversarial training only for
MF-BPR (APR, evaluation_adv.py:179-203) and SASRec (SASRec.py:365-414).
This wrapper extends the same recipe — perturb embedding rows by the
ε-scaled row-normalized gradient of the model's own loss, then add the
perturbed loss with weight ``reg_adv`` — to ANY model in the zoo
(GRU4Rec, Caser, DREAM, DRCF, NeuMF, ...), with optional multi-step
(PGD-style) perturbations (MSAP, arXiv:2010.01329).

Perturbed leaves default to every top-level 2-D parameter whose leading
dimension is the user or item count (i.e. the embedding tables); pass
``leaves`` to override. The base model's ``adv_target_loss`` — its
UNREGULARIZED training loss — is the linearization point, mirroring APR's
use of its raw BPR loss (evaluation_adv.py:192-203).

Use with the two-phase protocol exactly like apr/asasrec::

    clean = GRU4Rec(U, I, d, maxlen=L)
    adv = FGSMAdversarial(U, I, d, base=GRU4Rec(U, I, d, maxlen=L),
                          eps=0.5, reg_adv=1.0)
    fit_two_phase(clean, adv, data, optimizer, cfg, adv_epoch=K)

or from the CLI: ``--model gru4rec --fgsm --adv_epoch K``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from acf_tpu.models.base import PairwiseModel, project_rows, row_normalize


@dataclasses.dataclass(eq=False)
class FGSMAdversarial(PairwiseModel):
    base: Any = None
    eps: float = 0.5
    reg_adv: float = 1.0
    adv_steps: int = 1
    leaves: Optional[Tuple[str, ...]] = None  # None = auto-detect tables

    def __post_init__(self):
        # delegate the trainer-facing surface to the base model
        self.batch_kind = getattr(self.base, "batch_kind", "pair")
        for attr in ("maxlen", "uses_full_hist", "dns", "eval_batch_users"):
            if hasattr(self.base, attr):
                setattr(self, attr, getattr(self.base, attr))
        if hasattr(self.base, "extra_device_data"):
            self.extra_device_data = self.base.extra_device_data
        if hasattr(self.base, "init_opt_state"):
            self.init_opt_state = self.base.init_opt_state

    # -- delegation ----------------------------------------------------
    def init_params(self, key):
        return self.base.init_params(key)

    def score_all(self, params, users, hists):
        return self.base.score_all(params, users, hists)

    def score_some(self, params, users, hists, items):
        return self.base.score_some(params, users, hists, items)

    def factored_scorer(self):
        fs = getattr(self.base, "factored_scorer", lambda: None)
        return fs()

    # -- adversarial objective ------------------------------------------
    def _leaf_names(self, params):
        if self.leaves is not None:
            return tuple(self.leaves)
        names = []
        for k, v in params.items():
            if (hasattr(v, "ndim") and v.ndim == 2
                    and v.shape[0] in (self.num_users, self.num_items)):
                names.append(k)
        if not names:
            raise ValueError(
                "FGSMAdversarial found no embedding-like top-level leaves "
                f"in {list(params)}; pass leaves=(...) explicitly")
        return tuple(names)

    def deltas(self, params, batch, key):
        """ε-ball perturbations of the selected leaves: ``adv_steps``
        iterations of step size ε/adv_steps, gradient of the base loss at
        the perturbed point, per-row projection (adv_steps=1 = plain FGSM,
        the APR recipe, evaluation_adv.py:192-203)."""
        names = self._leaf_names(params)

        # linearize on the UNREGULARIZED loss — the APR recipe takes the
        # delta from the raw BPR loss, not the regularized objective
        # (evaluation_adv.py:162 vs 192-203); adv_target_loss defaults to
        # the full loss for models without in-loss regularizers
        def clean(prm):
            return self.base.adv_target_loss(prm, batch, key)

        def project(d):
            return project_rows(d, self.eps)

        alpha = self.eps / self.adv_steps
        delta = {k: jnp.zeros_like(params[k]) for k in names}
        for _ in range(self.adv_steps):
            shifted = dict(params)
            for k in names:
                shifted[k] = params[k] + delta[k]
            g = jax.lax.stop_gradient(jax.grad(clean)(shifted))
            delta = {k: project(delta[k] + alpha * row_normalize(g[k]))
                     for k in names}
        return delta

    def loss(self, params, batch, key):
        k_clean, k_adv = jax.random.split(key)
        loss, aux = self.base.loss(params, batch, k_clean)
        delta = self.deltas(params, batch, k_clean)
        perturbed = dict(params)
        for k, d in delta.items():
            perturbed[k] = params[k] + d
        # the adversarial addend is the model's PRIMARY loss at the perturbed
        # point — aux["loss"], the zoo convention for the pre-reg data loss
        # (APR adds reg_adv · BPR_adv, the raw pairwise loss,
        # evaluation_adv.py:168-174; re-weighting the base regularizer by
        # reg_adv would train a different objective)
        loss_adv_full, aux_adv = self.base.loss(perturbed, batch, k_adv)
        loss_adv = aux_adv.get("loss", loss_adv_full)
        aux = dict(aux)
        aux["loss_adv"] = loss_adv
        aux["acc_adv"] = aux_adv.get("acc", jnp.float32(0.0))
        return loss + self.reg_adv * loss_adv, aux
