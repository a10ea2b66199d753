"""GRU4Rec: session-based GRU recommendation with in-batch negatives.

The reference (GRU4Rec.py:43-330) trains a stateful GRU with
session-parallel minibatching — a host-side pointer-chasing loop that feeds
one item per ``sess.run`` (GRU4Rec.py:249-276). That structure exists only to
keep RNN state alive on a CPU stream; on TPU we instead scan whole
right-aligned session windows under ``jit``, which is mathematically the same
unrolled recurrence.

Loss semantics preserved (GRU4Rec.py:152-162): at every step the batch's
target items form the candidate set; ``bpr`` = mean(-log σ(ŷ_ii − ŷ_ij)),
``top1`` = mean σ(ŷ_ij − ŷ_ii) + σ(ŷ_jj²) regularizer, ``ce`` = softmax CE
over in-batch targets. Pad positions are masked out of the loss and the
recurrence (state freezing ≙ the reference's per-session state reset).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from acf_tpu.models.base import SequenceModel
from acf_tpu.nn.rnn import gru_cell, init_gru, run_rnn


@dataclasses.dataclass(eq=False)
class GRU4Rec(SequenceModel):
    loss_type: str = "bpr"       # 'bpr' | 'top1' | 'ce' (GRU4Rec.py:100-123)
    final_act: str = "linear"    # 'linear' | 'relu' | 'tanh'
    hidden_act: str = "tanh"

    def __post_init__(self):
        if self.loss_type not in ("bpr", "top1", "ce"):
            raise ValueError(f"gru4rec loss_type {self.loss_type!r} not in "
                             "('bpr', 'top1', 'ce')")
        if self.final_act not in ("linear", "relu", "tanh"):
            raise ValueError(f"gru4rec final_act {self.final_act!r}")
        if self.hidden_act not in ("tanh", "relu"):
            raise ValueError(f"gru4rec hidden_act {self.hidden_act!r}")

    def _act(self, x):
        if self.final_act == "relu":
            return jax.nn.relu(x)
        if self.final_act == "tanh":
            return jnp.tanh(x)
        return x

    def init_params(self, key):
        d = self.dim
        k1, k2, k3 = jax.random.split(key, 3)
        # reference init: uniform(±sqrt(6/(n_items + rnn_size)))
        # (GRU4Rec.py:172-176)
        sigma = np.sqrt(6.0 / (self.num_items + d))
        return {
            "emb": jax.random.uniform(k1, (self.num_items, d), jnp.float32,
                                      -sigma, sigma),
            "gru": init_gru(k2, d, d),
            "W": jax.random.uniform(k3, (self.num_items, d), jnp.float32,
                                    -sigma, sigma),
            "b": jnp.zeros((self.num_items,)),
        }

    def _hidden_states(self, params, seq):
        """[B, T] → per-step hidden states [B, T, d]."""
        act = jnp.tanh if self.hidden_act == "tanh" else jax.nn.relu
        xs = params["emb"][seq]
        mask = seq != 0
        h0 = jnp.zeros((seq.shape[0], self.dim))
        cell = lambda p, x, h: gru_cell(p, x, h, activation=act)
        _, hs = run_rnn(cell, params["gru"], xs, mask, h0)
        return hs

    def loss(self, params, batch, key):
        users, seq, pos, neg = batch  # neg unused: in-batch negatives
        hs = self._hidden_states(params, seq)  # [B, T, d]
        b, t, d = hs.shape
        w = params["W"][pos]  # [B, T, d] target output embeddings
        bias = params["b"][pos]  # [B, T]
        # in-batch logits per step: yhat[t, i, j] = h_i(t) · w_j(t) + b_j(t)
        yhat = jnp.einsum("itd,jtd->tij", hs, w) + bias.T[:, None, :]  # [T,B,B]
        yhat = self._act(yhat)
        valid = (pos != 0).T  # [T, B]
        # a (step, row) contributes iff its own target is valid; candidate
        # columns are the valid targets of the same step
        pair_ok = valid[:, None, :] & valid[:, :, None]  # [T, i, j]
        diag = jnp.einsum("tii->ti", yhat)  # [T, B]
        if self.loss_type == "bpr":
            diff = diag[:, :, None] - yhat  # [T, i, j]
            lt = -jnp.log(jax.nn.sigmoid(diff) + 1e-24)
            loss = jnp.sum(lt * pair_ok) / jnp.maximum(jnp.sum(pair_ok), 1.0)
        elif self.loss_type == "top1":
            term = jax.nn.sigmoid(yhat - diag[:, :, None]) + \
                jax.nn.sigmoid(jnp.square(yhat))
            corr = jax.nn.sigmoid(jnp.square(diag)) / b  # remove self term
            loss = jnp.sum(term * pair_ok) / jnp.maximum(jnp.sum(pair_ok), 1.0) \
                - jnp.sum(corr * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        else:  # cross-entropy over in-batch targets
            logits = jnp.where(pair_ok, yhat, -1e9)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ld = -jnp.einsum("tii->ti", logp)
            loss = jnp.sum(ld * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        acc = jnp.sum((diag[:, :, None] > yhat) * pair_ok) / \
            jnp.maximum(jnp.sum(pair_ok), 1.0)
        return loss, {"loss": loss, "acc": acc}

    def score_all(self, params, users, hists):
        seq = hists[:, -self.maxlen:]
        hs = self._hidden_states(params, seq)
        h_last = hs[:, -1, :]
        return self._act(h_last @ params["W"].T + params["b"])

    def score_some(self, params, users, hists, items):
        seq = hists[:, -self.maxlen:]
        h_last = self._hidden_states(params, seq)[:, -1, :]
        return self._act(jnp.einsum("bd,bmd->bm", h_last, params["W"][items])
                         + params["b"][items])

    # -- streaming session API (reference predict_next_batch,
    # GRU4Rec.py:285-327): carry hidden state across events --------------
    def init_state(self, batch_size: int):
        return jnp.zeros((batch_size, self.dim))

    def step_state(self, params, state, items, reset_mask=None):
        """One streaming step: consume one item per session, return the
        next-item scores over the catalog and the new hidden state.

        Args:
          state: [B, d] hidden state from the previous event.
          items: [B] current item ids (0 = no event; state unchanged).
          reset_mask: optional [B] bool — True resets that session's state
            first (session change, GRU4Rec.py:314-318).
        """
        act = jnp.tanh if self.hidden_act == "tanh" else jax.nn.relu
        if reset_mask is not None:
            state = jnp.where(reset_mask[:, None], 0.0, state)
        x = params["emb"][items]
        new = gru_cell(params["gru"], x, state, activation=act)
        state = jnp.where((items != 0)[:, None], new, state)
        scores = self._act(state @ params["W"].T + params["b"])
        return state, scores

    def factored_scorer(self):
        # relu/tanh final activations change tie structure, so the factored
        # path is only rank-exact for the (default) linear activation
        if self.final_act != "linear":
            return None
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                seq = hists[:, -self.maxlen:]
                return self._hidden_states(params, seq)[:, -1, :]

            def table(params):
                return params["W"], params["b"]

            self._fs = (user_repr, table)
        return self._fs
