"""Naive baselines (reference NaiveBaselines.py:6-77).

* MostPopular — global item interaction counts.
* MostRecentlyVisit — 1 for the user's last train item, else 0.
* MostFrequentlyVisit — the user's own per-item visit counts.
* AlreadyVisit — 1 for any item in the user's train set. Referenced by the
  reference CLI (run.py:17, 200-201) but never implemented there (broken
  import); implemented here per its evident intent.

These have no trainable parameters: "params" are score tables baked from the
dataset, and the epoch is a no-op (run.py:275-276 breaks after one epoch).
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np

from acf_tpu.data.datasets import Interactions
from acf_tpu.models.base import PairwiseModel


@dataclasses.dataclass(eq=False)
class _NaiveBase(PairwiseModel):
    data: Interactions = None

    def init_params(self, key):
        return {"_": jnp.zeros(())}

    def init_opt_state(self, optimizer, params):
        return ()

    def make_epoch_fn(self, optimizer, batch_size, num_batches, dev=None,
                      mesh=None):
        # naive baselines train nothing (scores come from init_params'
        # host-side counting pass) — a mesh changes nothing here, so the
        # no-op epoch accepts and ignores it rather than refusing
        def epoch_fn(carry, data, key):
            return carry, {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
        return epoch_fn

    def loss(self, params, batch, key):
        z = jnp.zeros(())
        return z, {"loss": z, "acc": z}


@dataclasses.dataclass(eq=False)
class MostPopular(_NaiveBase):
    """Global popularity (NaiveBaselines.py:6-27)."""

    def init_params(self, key):
        # raw interaction counts incl. duplicate visits (reference
        # NaiveBaselines.py:9 groups the full df) — a unique-pair bincount
        # reorders items on duplicate-heavy check-in datasets
        if self.data.item_count is not None:
            counts = self.data.item_count
        else:
            counts = np.bincount(self.data.pairs_i, minlength=self.num_items)
        return {"counts": jnp.asarray(counts.astype(np.float32))}

    def score_all(self, params, users, hists):
        return jnp.broadcast_to(params["counts"][None, :],
                                (users.shape[0], self.num_items))

    def score_some(self, params, users, hists, items):
        return params["counts"][items]


@dataclasses.dataclass(eq=False)
class MostRecentlyVisit(_NaiveBase):
    """1 for the last visited item (NaiveBaselines.py:35-52)."""

    def score_all(self, params, users, hists):
        last = hists[:, -1]  # right-aligned → last column is most recent
        scores = jnp.zeros((users.shape[0], self.num_items))
        return scores.at[jnp.arange(users.shape[0]), last].set(1.0)

    def score_some(self, params, users, hists, items):
        last = hists[:, -1]
        return (items == last[:, None]).astype(jnp.float32)


@dataclasses.dataclass(eq=False)
class MostFrequentlyVisit(_NaiveBase):
    """Per-user visit counts (NaiveBaselines.py:54-77)."""

    def score_all(self, params, users, hists):
        b = users.shape[0]
        scores = jnp.zeros((b, self.num_items))
        rows = jnp.arange(b)[:, None]
        ones = jnp.where(hists != 0, 1.0, 0.0)
        scores = scores.at[rows, hists].add(ones)
        return scores.at[:, 0].set(0.0)

    def score_some(self, params, users, hists, items):
        return (items[:, :, None] == hists[:, None, :]).sum(-1).astype(jnp.float32)


@dataclasses.dataclass(eq=False)
class AlreadyVisit(_NaiveBase):
    """Membership indicator (intent of the reference's missing class)."""

    def score_all(self, params, users, hists):
        scores = MostFrequentlyVisit.score_all(self, params, users, hists)
        return (scores > 0).astype(jnp.float32)

    def score_some(self, params, users, hists, items):
        return (items[:, :, None] == hists[:, None, :]).any(-1).astype(jnp.float32)
