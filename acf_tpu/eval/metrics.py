"""Closed-form leave-one-out ranking metrics.

The reference computes, per user, ``position = (neg_scores >= pos_score).sum()``
and then HR@k / NDCG@k for k = 1..K plus AUC in a python loop
(reference evaluation_adv.py:463-486). Given the rank position those metrics
are closed-form, so here they are vectorized over all users at once:

    hr[k]   = position < k
    ndcg[k] = log(2) / log(position + 2)   if position < k else 0
    auc     = 1 - position / num_negatives
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def metrics_from_position(position, num_negatives, K: int = 100):
    """Vectorized HR@1..K, NDCG@1..K, AUC from rank positions.

    Args:
      position: [U] int — number of candidates scoring >= the held-out item
        (0 = ranked first).
      num_negatives: [U] int — per-user candidate-set size (excluding the gt).
      K: max cutoff.

    Returns:
      (hr, ndcg, auc): hr/ndcg are [U, K] float32, auc is [U] float32.
      Matches reference evaluation_adv.py:477-480 exactly.
    """
    position = jnp.asarray(position)
    num_negatives = jnp.asarray(num_negatives)
    ks = jnp.arange(1, K + 1)  # [K]
    hit = position[:, None] < ks[None, :]  # [U, K]
    dcg = jnp.log(2.0) / jnp.log(position.astype(jnp.float32) + 2.0)  # [U]
    hr = hit.astype(jnp.float32)
    ndcg = jnp.where(hit, dcg[:, None], 0.0)
    auc = 1.0 - position.astype(jnp.float32) / jnp.maximum(
        num_negatives.astype(jnp.float32), 1.0)
    return hr, ndcg, auc


def mean_metrics(hr, ndcg, auc, k: int = 10):
    """Mean HR@k / NDCG@k / AUC over users as python floats."""
    hr = np.asarray(hr)
    ndcg = np.asarray(ndcg)
    auc = np.asarray(auc)
    return float(hr[:, k - 1].mean()), float(ndcg[:, k - 1].mean()), float(auc.mean())
