"""DREAM: SimpleRNN over the interaction sequence, BPR-style objective.

Reference DREAM.py:9-91 (Keras) and DREAM_TF (DREAM.py:94-164): a single
item-embedding table feeds an RNN; the hidden state scores candidate items by
dot product; training minimizes BCE on σ(posDot − negDot) with label 1 —
i.e. −log σ(pos − neg).

The reference materializes one padded *prefix window per interaction*
(DREAM.py:47-70, a python loop building O(Σ|seq|) training rows). Scanning a
right-aligned window once gives the hidden state after every prefix in one
pass, so each (position t → next item) pair is trained from the same
recurrence without materializing prefixes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from acf_tpu.models.base import SequenceModel
from acf_tpu.nn.rnn import init_simple_rnn, run_rnn, simple_rnn_cell


@dataclasses.dataclass(eq=False)
class DREAM(SequenceModel):
    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        d = self.dim
        emb = jax.random.uniform(k1, (self.num_items, d), jnp.float32,
                                 -0.05, 0.05)
        emb = emb.at[0].set(0.0)  # mask_zero (DREAM.py:21)
        return {"emb": emb, "rnn": init_simple_rnn(k2, d, d)}

    def _hidden_states(self, params, seq):
        xs = params["emb"][seq]
        mask = seq != 0
        h0 = jnp.zeros((seq.shape[0], self.dim))
        _, hs = run_rnn(simple_rnn_cell, params["rnn"], xs, mask, h0)
        return hs

    def loss(self, params, batch, key):
        users, seq, pos, neg = batch
        hs = self._hidden_states(params, seq)  # [B, T, d]
        pos_s = jnp.sum(hs * params["emb"][pos], -1)
        neg_s = jnp.sum(hs * params["emb"][neg], -1)
        ist = (pos != 0).astype(jnp.float32)
        n = jnp.maximum(ist.sum(), 1.0)
        # BCE(σ(pos−neg), 1) = softplus(−(pos−neg))  (DREAM.py:30-41)
        loss = jnp.sum(jnp.logaddexp(0.0, -(pos_s - neg_s)) * ist) / n
        acc = jnp.sum((pos_s > neg_s) * ist) / n
        return loss, {"loss": loss, "acc": acc}

    def score_all(self, params, users, hists):
        seq = hists[:, -self.maxlen:]
        h_last = self._hidden_states(params, seq)[:, -1, :]
        return h_last @ params["emb"].T

    def score_some(self, params, users, hists, items):
        seq = hists[:, -self.maxlen:]
        h_last = self._hidden_states(params, seq)[:, -1, :]
        return jnp.einsum("bd,bmd->bm", h_last, params["emb"][items])

    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                seq = hists[:, -self.maxlen:]
                return self._hidden_states(params, seq)[:, -1, :]

            def table(params):
                return params["emb"], None

            self._fs = (user_repr, table)
        return self._fs
