"""DSIN: Deep Session Interest Network (working TPU-native implementation).

The reference ships a *broken* deepctr wrapper (reference DSIN.py:11-98:
undefined ``self.maxVenue`` at :58, ``rank`` delegating to the abstract
base at :92-93, import-time instantiation at :98) — the capability it
intends is the IJCAI'19 DSIN architecture for CTR: divide the behavior
sequence into sessions, extract a per-session interest with bias-encoded
self-attention, model interest evolution across sessions with a recurrent
layer, activate interests against the candidate item, and score through a
DNN. This module implements that architecture for real:

  * sessions: the right-aligned history window [B, S·Ls] split into S
    sessions of Ls items;
  * interest extractor: per-session self-attention (shared QKV) with a
    learned bias encoding over (session, position), masked mean-pool;
  * interest evolution: GRU over session interests (the paper's Bi-LSTM,
    simplified to a GRU — interests are short sequences);
  * activation units: softmax attention of the candidate item over both raw
    and evolved interests;
  * DNN [d, d, d] relu over [user ; item ; act(raw) ; act(evolved)] → logit.

Training: pointwise sigmoid CE on (history → next item) with one sampled
negative (reference DSIN.py:50-73 semantics).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from acf_tpu.models.base import SequenceModel
from acf_tpu.nn.layers import dense, glorot_uniform, init_dense, trunc_normal


@dataclasses.dataclass(eq=False)
class DSIN(SequenceModel):
    sess_count: int = 5   # S sessions ...
    sess_len: int = 10    # ... of Ls items; maxlen is forced to S*Ls
    num_heads: int = 1
    # capacity control — without these the DNN head memorizes a sparse
    # catalog in tens of epochs (round-4 Video zoo run: train ACC → 1.0 by
    # epoch 50 while HR@10 halves). Dropout on the DNN hidden layers
    # (train-time only) + L2 on the embedding rows a batch touches.
    # Round-4 Video sweep (out/r4_dsin_sweep*): dropout 0.5 + l2 1e-4 with
    # adam lr 1e-4 (NOT the zoo's usual 1e-3 — at 1e-3 every config
    # converges in one epoch then memorizes) is the best found
    # configuration; the CLI and zoo builders use that lr for DSIN.
    dropout: float = 0.5
    l2_emb: float = 1e-4
    # "bce": pointwise sigmoid CE on (pos, neg) — the reference DSIN's CTR
    # objective (DSIN.py:50-73). "bpr": pairwise -log σ(pos − neg) on the
    # same head — the ranking objective the leave-one-out protocol actually
    # measures; pointwise CE saturates into memorization on sparse implicit
    # data (round-4 sweep) where the pairwise margin does not.
    loss_type: str = "bce"
    # Paper-faithful BIdirectional interest evolution (IJCAI'19 DSIN uses a
    # Bi-LSTM over session interests; the broken reference wrapper intended
    # the same, DSIN.py:11-98). Sum-merge of the two directions keeps the
    # evolved-interest width at d, so the activation/DNN head is unchanged
    # and the flag is a pure architecture toggle (VERDICT r4 #6). Default
    # off: Video's short histories yield ~2 real sessions per user, where
    # the backward direction adds parameters but little signal — measured
    # row in docs/PARITY.md.
    bi_evolution: bool = False

    eval_batch_users = 128
    _item_chunk = 2048

    def __post_init__(self):
        # validate like APL does for loss_function: a typo (or a CLI --loss
        # meant for another model leaking through) must not silently fall
        # back to the bce branch (round-4 advisor finding)
        if self.loss_type not in ("bce", "bpr"):
            raise ValueError(
                f"DSIN loss_type must be 'bce' or 'bpr', got "
                f"{self.loss_type!r}")
        self.maxlen = self.sess_count * self.sess_len

    def init_params(self, key):
        d = self.dim
        ks = jax.random.split(key, 13)
        p = self._base_params(ks, d)
        if self.bi_evolution:
            p["gru_bwd"] = _init_gru(ks[12], d, d)
        return p

    def _base_params(self, ks, d):
        return {
            "user_emb": trunc_normal(ks[0], (self.num_users, d), 0.01),
            "item_emb": trunc_normal(ks[1], (self.num_items, d), 0.01)
                        .at[0].set(0.0),
            # bias encoding over (session, position, dim) — stored factored
            # as in the paper: b_sess [S,1,1]+b_pos [1,Ls,1]+b_dim [1,1,d]
            "b_sess": jnp.zeros((self.sess_count, 1, 1)),
            "b_pos": jnp.zeros((1, self.sess_len, 1)),
            "b_dim": jnp.zeros((1, 1, d)),
            "wq": init_dense(ks[2], d, d),
            "wk": init_dense(ks[3], d, d),
            "wv": init_dense(ks[4], d, d),
            "gru": _init_gru(ks[5], d, d),
            "act_w1": glorot_uniform(ks[6], (d, d)),  # raw-interest activation
            "act_w2": glorot_uniform(ks[7], (d, d)),  # evolved activation
            "dnn1": init_dense(ks[8], 4 * d, d),
            "dnn2": init_dense(ks[9], d, d),
            "dnn3": init_dense(ks[10], d, d),
            "out": init_dense(ks[11], d, 1),
        }

    # ------------------------------------------------------------------
    def _interests(self, params, seq):
        """[B, S·Ls] history → (raw [B,S,d], evolved [B,S,d], sess_mask)."""
        b = seq.shape[0]
        S, Ls, d = self.sess_count, self.sess_len, self.dim
        sess = seq.reshape(b, S, Ls)
        mask = sess != 0  # [B, S, Ls]
        x = params["item_emb"][sess]  # [B, S, Ls, d]
        x = x + (params["b_sess"] + params["b_pos"] + params["b_dim"])[None]
        # per-session self-attention (sessions batched together)
        q = dense(params["wq"], x)
        k = dense(params["wk"], x)
        v = dense(params["wv"], x)
        scores = jnp.einsum("bsqd,bskd->bsqk", q, k) / math.sqrt(d)
        scores = jnp.where(mask[:, :, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bsqk,bskd->bsqd", probs, v)
        att = att * mask[..., None]
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1)  # [B, S, 1]
        raw = att.sum(2) / denom  # masked mean-pool → [B, S, d]
        sess_mask = mask.any(-1)  # [B, S]
        raw = raw * sess_mask[..., None]

        # interest evolution: GRU over the S sessions
        def body(h, inp):
            x_t, m_t = inp
            h_new = _gru_cell(params["gru"], x_t, h)
            h = jnp.where(m_t[:, None], h_new, h)
            return h, h

        xs = jnp.swapaxes(raw, 0, 1)  # [S, B, d]
        ms = jnp.swapaxes(sess_mask, 0, 1)
        _, hs = jax.lax.scan(body, jnp.zeros((b, d)), (xs, ms))
        evolved = jnp.swapaxes(hs, 0, 1)  # [B, S, d]

        if self.bi_evolution:
            # backward direction over the sessions (paper's Bi-RNN,
            # sum-merged so the evolved width stays d); empty (padded)
            # sessions are skipped the same way as forward
            def body_b(h, inp):
                x_t, m_t = inp
                h_new = _gru_cell(params["gru_bwd"], x_t, h)
                h = jnp.where(m_t[:, None], h_new, h)
                return h, h

            _, hs_b = jax.lax.scan(body_b, jnp.zeros((b, d)),
                                   (xs[::-1], ms[::-1]))
            evolved = evolved + jnp.swapaxes(hs_b[::-1], 0, 1)
        return raw, evolved, sess_mask

    def _activation_pool(self, interests, sess_mask, w, item_e):
        """softmax_s(interest_s · W · item) pooled interests.

        interests [B,S,d], item_e [..., d] broadcastable over leading dims.
        """
        proj = interests @ w  # [B, S, d]
        logits = jnp.einsum("bsd,b...d->b...s", proj, item_e)
        logits = jnp.where(sess_mask[:, None, :] if logits.ndim == 3
                           else sess_mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("b...s,bsd->b...d", probs, interests)

    def _head(self, params, users, interests, items, drop_key=None):
        """Score ``items`` [B, M] given precomputed session interests.
        ``drop_key`` enables train-time dropout on the DNN hidden layers
        (inference passes None → deterministic)."""
        raw, evolved, sess_mask = interests
        item_e = params["item_emb"][items]  # [B, M, d]
        u_raw = self._activation_pool(raw, sess_mask, params["act_w1"], item_e)
        u_ev = self._activation_pool(evolved, sess_mask, params["act_w2"], item_e)
        u_e = jnp.broadcast_to(params["user_emb"][users][:, None, :],
                               item_e.shape)
        vec = jnp.concatenate([u_e, item_e, u_raw, u_ev], axis=-1)

        if drop_key is not None and self.dropout > 0.0:
            ks = jax.random.split(drop_key, 3)
            keep = 1.0 - self.dropout

            def drop(i, h):
                m = jax.random.bernoulli(ks[i], keep, h.shape)
                return jnp.where(m, h / keep, 0.0)
        else:
            drop = lambda i, h: h
        h = drop(0, jax.nn.relu(dense(params["dnn1"], vec)))
        h = drop(1, jax.nn.relu(dense(params["dnn2"], h)))
        h = drop(2, jax.nn.relu(dense(params["dnn3"], h)))
        return dense(params["out"], h)[..., 0]  # [B, M]

    def _logits(self, params, users, seq, items, drop_key=None):
        """items [B] or [B, M] → matching logits."""
        interests = self._interests(params, seq)
        squeeze = items.ndim == 1
        it = items[:, None] if squeeze else items  # [B, M]
        out = self._head(params, users, interests, it, drop_key=drop_key)
        return out[:, 0] if squeeze else out

    # ------------------------------------------------------------------
    def loss(self, params, batch, key):
        users, seq, pos, neg = batch  # windowed seq batch
        pos_t = pos[:, -1]  # next item (final window position)
        neg_t = neg[:, -1]
        logits = self._logits(params, users, seq,
                              jnp.stack([pos_t, neg_t], axis=1),
                              drop_key=key)  # [B, 2]
        valid = (pos_t != 0).astype(jnp.float32)
        n = jnp.maximum(valid.sum(), 1.0)
        if self.loss_type == "bpr":
            per = jnp.logaddexp(0.0, -(logits[:, 0] - logits[:, 1]))
        else:
            per = (jnp.logaddexp(0.0, -logits[:, 0])
                   + jnp.logaddexp(0.0, logits[:, 1]))
        loss = jnp.sum(per * valid) / n
        acc = jnp.sum((logits[:, 0] > logits[:, 1]) * valid) / n
        if self.l2_emb > 0.0:
            # rows this batch touches only (sparse-equivalent decay): the
            # user row, the history window, and the candidate pair
            reg = (jnp.sum(jnp.square(params["user_emb"][users]))
                   + jnp.sum(jnp.square(params["item_emb"][seq]))
                   + jnp.sum(jnp.square(params["item_emb"][pos_t]))
                   + jnp.sum(jnp.square(params["item_emb"][neg_t])))
            loss = loss + self.l2_emb * reg / jnp.maximum(
                jnp.float32(users.shape[0]), 1.0)
        return loss, {"loss": loss, "acc": acc}

    def score_all(self, params, users, hists):
        seq = hists[:, -self.maxlen:]
        b = users.shape[0]
        if seq.shape[1] < self.maxlen:
            seq = jnp.pad(seq, ((0, 0), (self.maxlen - seq.shape[1], 0)))
        c = self._item_chunk
        n_chunks = -(-self.num_items // c)
        items = jnp.arange(n_chunks * c, dtype=jnp.int32).reshape(n_chunks, c)
        items = jnp.minimum(items, self.num_items - 1)
        interests = self._interests(params, seq)  # hoisted out of the chunks

        def chunk_fn(chunk_items):
            it = jnp.broadcast_to(chunk_items[None, :], (b, c))
            return self._head(params, users, interests, it)

        out = jax.lax.map(chunk_fn, items)
        return out.transpose(1, 0, 2).reshape(b, n_chunks * c)[:, :self.num_items]

    def score_some(self, params, users, hists, items):
        seq = hists[:, -self.maxlen:]
        if seq.shape[1] < self.maxlen:
            seq = jnp.pad(seq, ((0, 0), (self.maxlen - seq.shape[1], 0)))
        return self._logits(params, users, seq, items)


def _init_gru(key, d_in, d_h):
    from acf_tpu.nn.rnn import init_gru
    return init_gru(key, d_in, d_h)


def _gru_cell(p, x, h):
    from acf_tpu.nn.rnn import gru_cell
    return gru_cell(p, x, h)
