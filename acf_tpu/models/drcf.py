"""DRCF: Dynamic Recurrent Collaborative Filtering.

Reference DRCF.py:15-215: dual GMF+MLP towers, each with a *static* user
embedding, an item embedding, and an RNN-encoded sequence ("dynamic user")
embedding — and each tower split again into a dot-product branch (its own
embedding tables) and an element-wise branch. Outputs are concatenated
through an MLP ([d, 3d, 2d, d] relu) into a linear prediction; training is
the BPR triplet objective (DRCF.py:151-167).

The reference builds one padded prefix window per interaction in python
(DRCF.py:182-207); here one RNN scan per window yields every prefix state,
and all four RNNs (MF/DOT-MF at dim d, MLP/DOT-MLP at dim d/2 —
DRCF.py:51-57, 104-110) run in the same jitted step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from acf_tpu.models.base import SequenceModel
from acf_tpu.nn.layers import dense, init_dense, trunc_normal
from acf_tpu.nn.rnn import init_simple_rnn, run_rnn, simple_rnn_cell


@dataclasses.dataclass(eq=False)
class DRCF(SequenceModel):
    eval_batch_users = 128
    _item_chunk = 2048

    def init_params(self, key):
        d = self.dim
        h = d // 2
        ks = jax.random.split(key, 20)
        i = iter(range(20))
        # init_normal(0, 0.01) per DRCF.py:11-12
        def emb(k, n, dd):
            return trunc_normal(k, (n, dd), 0.01)
        return {
            "mf_u": emb(ks[next(i)], self.num_users, d),
            "mf_i": emb(ks[next(i)], self.num_items, d),
            "mf_c": emb(ks[next(i)], self.num_items, d),
            "dot_mf_u": emb(ks[next(i)], self.num_users, d),
            "dot_mf_i": emb(ks[next(i)], self.num_items, d),
            "dot_mf_c": emb(ks[next(i)], self.num_items, d),
            "mlp_u": emb(ks[next(i)], self.num_users, h),
            "mlp_i": emb(ks[next(i)], self.num_items, h),
            "mlp_c": emb(ks[next(i)], self.num_items, h),
            "dot_mlp_u": emb(ks[next(i)], self.num_users, h),
            "dot_mlp_i": emb(ks[next(i)], self.num_items, h),
            "dot_mlp_c": emb(ks[next(i)], self.num_items, h),
            "rnn_mf": init_simple_rnn(ks[next(i)], d, d),
            "rnn_dot_mf": init_simple_rnn(ks[next(i)], d, d),
            "rnn_mlp": init_simple_rnn(ks[next(i)], h, h),
            "rnn_dot_mlp": init_simple_rnn(ks[next(i)], h, h),
            # MLP layers [d, 3d, 2d, d] → dense widths 3d, 2d, d
            # over input [1 + 3h] (DRCF.py:25, 128-137)
            "l1": init_dense(ks[next(i)], 1 + 3 * h, 3 * d),
            "l2": init_dense(ks[next(i)], 3 * d, 2 * d),
            "l3": init_dense(ks[next(i)], 2 * d, d),
            "out": init_dense(ks[next(i)], (1 + d) + d, 1),
        }

    # ------------------------------------------------------------------
    def _dyn_states(self, params, seq, last_only: bool):
        """RNN states over the checkin window for all four towers.

        Returns dict of [B, T, ·] (or [B, ·] when ``last_only``).
        """
        mask = seq != 0
        out = {}
        for name, table, rnn in (
            ("mf", "mf_c", "rnn_mf"),
            ("dot_mf", "dot_mf_c", "rnn_dot_mf"),
            ("mlp", "mlp_c", "rnn_mlp"),
            ("dot_mlp", "dot_mlp_c", "rnn_dot_mlp"),
        ):
            xs = params[table][seq]
            h0 = jnp.zeros((seq.shape[0], xs.shape[-1]))
            h_final, hs = run_rnn(simple_rnn_cell, params[rnn], xs, mask, h0)
            out[name] = h_final if last_only else hs
        return out

    def _predict(self, params, dyn, u_static, items):
        """Score items given dynamic states and static user embeddings.

        All leading dims broadcast: dyn/u_static [..., d], items [...] int.
        """
        mf_i = params["mf_i"][items]
        dot_mf_i = params["dot_mf_i"][items]
        mlp_i = params["mlp_i"][items]
        dot_mlp_i = params["dot_mlp_i"][items]

        # broadcast every per-user piece to the items' leading shape so the
        # concatenations line up (e.g. static [B,1,h] vs per-position [B,T,h])
        lead = items.shape
        dyn = {k: jnp.broadcast_to(v, lead + v.shape[-1:]) for k, v in dyn.items()}
        u_static = {k: jnp.broadcast_to(v, lead + v.shape[-1:])
                    for k, v in u_static.items()}

        dot_scalar = jnp.sum(
            (dyn["dot_mf"] + u_static["dot_mf_u"]) * dot_mf_i, -1, keepdims=True)
        mf_vec = jnp.concatenate(
            [dot_scalar, dyn["mf"] * u_static["mf_u"] * mf_i], -1)

        mlp_dot_scalar = jnp.sum(
            (dyn["dot_mlp"] + u_static["dot_mlp_u"]) * dot_mlp_i, -1,
            keepdims=True)
        mlp_vec = jnp.concatenate(
            [mlp_dot_scalar, dyn["mlp"], u_static["mlp_u"], mlp_i], -1)
        mlp_vec = jax.nn.relu(dense(params["l1"], mlp_vec))
        mlp_vec = jax.nn.relu(dense(params["l2"], mlp_vec))
        mlp_vec = jax.nn.relu(dense(params["l3"], mlp_vec))

        vec = jnp.concatenate([mf_vec, mlp_vec], -1)
        return dense(params["out"], vec)[..., 0]

    def loss(self, params, batch, key):
        users, seq, pos, neg = batch
        dyn = self._dyn_states(params, seq, last_only=False)  # [B, T, ·]
        us = {f"{k}_u": params[f"{k}_u"][users][:, None, :]
              for k in ("mf", "dot_mf", "mlp", "dot_mlp")}
        pos_s = self._predict(params, dyn, us, pos)
        neg_s = self._predict(params, dyn, us, neg)
        ist = (pos != 0).astype(jnp.float32)
        n = jnp.maximum(ist.sum(), 1.0)
        # BPR triplet: 1 − log σ(pos − neg) (DRCF.py:151-158); the constant 1
        # does not affect gradients but is kept for loss-value parity
        loss = jnp.sum((1.0 + jnp.logaddexp(0.0, -(pos_s - neg_s))) * ist) / n
        acc = jnp.sum((pos_s > neg_s) * ist) / n
        return loss, {"loss": loss, "acc": acc}

    def score_all(self, params, users, hists):
        seq = hists[:, -self.maxlen:]
        b = users.shape[0]
        dyn = self._dyn_states(params, seq, last_only=True)  # [B, ·]
        us = {f"{k}_u": params[f"{k}_u"][users]
              for k in ("mf", "dot_mf", "mlp", "dot_mlp")}
        num_items = self.num_items
        c = self._item_chunk
        n_chunks = -(-num_items // c)
        items = jnp.arange(n_chunks * c, dtype=jnp.int32).reshape(n_chunks, c)
        items = jnp.minimum(items, num_items - 1)

        dyn_b = {k: v[:, None, :] for k, v in dyn.items()}
        us_b = {k: v[:, None, :] for k, v in us.items()}

        def chunk_fn(chunk_items):
            it = jnp.broadcast_to(chunk_items[None, :], (b, c))
            return self._predict(params, dyn_b, us_b, it)

        out = jax.lax.map(chunk_fn, items)  # [n_chunks, B, C]
        return out.transpose(1, 0, 2).reshape(b, n_chunks * c)[:, :num_items]

    def score_some(self, params, users, hists, items):
        seq = hists[:, -self.maxlen:]
        dyn = {k: v[:, None, :]
               for k, v in self._dyn_states(params, seq, True).items()}
        us = {f"{k}_u": params[f"{k}_u"][users][:, None, :]
              for k in ("mf", "dot_mf", "mlp", "dot_mlp")}
        return self._predict(params, dyn, us, items)
