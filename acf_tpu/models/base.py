"""Model protocol for the TPU-native CF zoo.

The reference's ``Recommender`` ABC (reference Recommender.py:3-27) couples
models to stateful sessions (``train(x, y, bs)`` mutates, ``rank`` runs a
per-user ``sess.run``). Here models are *pure*: a model object holds only
hyperparameters and exposes

  * ``init_params(key) -> params``       (a pytree of jnp arrays)
  * ``loss(params, batch, key) -> (scalar, aux)``   differentiable
  * ``score_all(params, users, hists) -> [B, num_items]``
  * ``score_some(params, users, hists, items) -> [B, M]``

Training state (optimizer slots etc.) lives in :mod:`acf_tpu.train`; device
placement and sharding are orthogonal (:mod:`acf_tpu.parallel`).

Two batch families exist, mirroring the reference's two data paths:

  * pairwise:  batch = (users [B], pos_items [B], neg_items [B])
    (reference evaluation_adv.py:50-93)
  * sequence:  batch = (users [B], seq [B, T], pos [B, T], neg [B, T])
    (reference SASRecLayers.py:329-358)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def row_normalize(x, eps: float = 1e-12):
    """Row-wise L2 normalization, ``tf.nn.l2_normalize(x, 1)`` semantics
    (zero rows stay zero)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def bpr_pair_loss(pos_scores, neg_scores):
    """The reference's numerically-stable BPR objective
    (evaluation_adv.py:160-162): ``sum(softplus(-(clip(pos - neg))))``."""
    diff = jnp.clip(pos_scores - neg_scores, -80.0, 1e8)
    return jnp.sum(jnp.logaddexp(0.0, -diff))


def project_rows(d, eps, axis=-1):
    """Per-row L2 projection into the ε-ball:
    ``d * min(1, eps / max(||d||, 1e-12))`` — the PGD-style multi-step clip
    shared by every adversarial path (a no-op at ``adv_steps == 1`` where
    ``||d|| == eps`` exactly)."""
    n = jnp.sqrt(jnp.sum(jnp.square(d), axis=axis, keepdims=True))
    return d * jnp.minimum(1.0, eps / jnp.maximum(n, 1e-12))


@dataclasses.dataclass(eq=False)
class PairwiseModel:
    """Base for models trained on (user, pos, neg) triples."""

    num_users: int
    num_items: int
    dim: int

    batch_kind = "pair"

    def init_params(self, key):
        raise NotImplementedError

    def loss(self, params, batch, key):
        raise NotImplementedError

    def adv_target_loss(self, params, batch, key):
        """Linearization target for FGSM/PGD perturbations: the
        UNREGULARIZED training loss. The reference's FGSM linearizes on the
        raw BPR/pointwise loss (evaluation_adv.py:192-203, SASRec.py:365-371),
        never on the regularized objective. The default returns the full
        loss — correct for the zoo models whose ``loss`` has no in-loss
        regularizer; models that fold one in (MFBPR ``reg``, SASRec
        ``l2_emb``) override."""
        return self.loss(params, batch, key)[0]

    def score_some(self, params, users, hists, items):
        """Default: gather columns of the full-catalog scores."""
        scores = self.score_all(params, users, hists)
        return jnp.take_along_axis(scores, items, axis=1)

    def score_all(self, params, users, hists):
        raise NotImplementedError

    def factored_scorer(self):
        """(user_repr_fn, table_fn) when scores factor as
        ``user_repr(params,u,h) · item_table + bias`` — enables the fused
        Pallas rank-position kernel (acf_tpu.ops.ranking). None otherwise.
        Implementations must cache the returned closures on the instance so
        jit caches keyed on them stay warm."""
        return None


@dataclasses.dataclass(eq=False)
class SequenceModel(PairwiseModel):
    """Base for next-item models trained on windowed sequences."""

    maxlen: int = 50
    batch_kind = "seq"

    def loss_window(self, params, batch, key):
        """``loss`` from the packed sampler form ``(users, window [B, T+1],
        neg [B, T])`` where ``seq = window[:, :-1]`` and
        ``pos = window[:, 1:]`` (sampling/negatives.py
        ``sample_seq_window_batch``). Default: expand and delegate.
        Models may override to exploit the seq/pos row overlap (SASRec
        does: one 2T+1-row table gather → one 2T+1-row backward scatter
        instead of 3T)."""
        users, window, neg = batch
        return self.loss(params, (users, window[:, :-1], window[:, 1:], neg),
                         key)
