"""Caser: Convolutional Sequence Embedding Recommendation.

Reference Caser.py:14-325 (the repo's one PyTorch model): embed the last L
items as an L×d "image"; horizontal convolutions (one kernel height per
length 1..L, n_h filters each, max-pooled over time) and a vertical
convolution (n_v filters over the time axis) feed a fully-connected layer;
the user representation [z ; user_emb] scores items through per-item output
embeddings W2/b2. Pointwise sigmoid loss over ``target_len`` targets and as
many sampled negatives per sliding window (Caser.py:33-91, 152-158).

TPU redesign: the horizontal convs become a static stack of NHWC
``lax.conv_general_dilated`` calls fused in one jit (the reference loops
``nn.ModuleList`` on CPU — 6,961–14,659 s/epoch in its own logs,
BASELINE.md); sliding-window instances are precomputed host-side as dense
arrays and scanned on device; negatives are resampled on device each epoch.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acf_tpu.data.datasets import Interactions
from acf_tpu.models.base import SequenceModel
from acf_tpu.nn.layers import dropout, glorot_uniform
from acf_tpu.sampling.negatives import sample_pair_epoch, uniform_negatives


@dataclasses.dataclass(eq=False)
class Caser(SequenceModel):
    n_h: int = 16         # horizontal filters per length (Caser.py:231)
    n_v: int = 4          # vertical filters (Caser.py:232)
    dropout_rate: float = 0.5
    target_len: int = 3   # targets per window (Caser.py:68)

    def init_params(self, key):
        d = self.dim
        L = self.maxlen
        ks = jax.random.split(key, 6 + L)
        # torch: embeddings normal(0, 1/d); W2 normal(0, 1/(2d)); b2 zero
        # (Caser.py:261-264)
        params = {
            "user_emb": jax.random.normal(ks[0], (self.num_users, d)) / d,
            "item_emb": jax.random.normal(ks[1], (self.num_items, d)) / d,
            "conv_v_w": glorot_uniform(ks[2], (L, self.n_v)),
            "conv_v_b": jnp.zeros((self.n_v,)),
            "conv_h": [],
            "fc1_w": glorot_uniform(ks[3], (self.n_v * d + self.n_h * L, d)),
            "fc1_b": jnp.zeros((d,)),
            "W2": jax.random.normal(ks[4], (self.num_items, 2 * d)) / (2 * d),
            "b2": jnp.zeros((self.num_items,)),
        }
        for l in range(1, L + 1):
            params["conv_h"].append({
                "w": glorot_uniform(ks[5 + l - 1], (l * d, self.n_h)).reshape(l, d, self.n_h),
                "b": jnp.zeros((self.n_h,)),
            })
        return params

    # ------------------------------------------------------------------
    def _user_repr(self, params, seq, users, train: bool, key=None):
        """[B, L] window + users → [B, 2d] representation x = [z ; P_u]."""
        E = params["item_emb"][seq]  # [B, L, d]
        b, L, d = E.shape
        # vertical conv: weighted sums over time per filter (Caser.py:241)
        out_v = jnp.einsum("bld,lv->bvd", E, params["conv_v_w"]) \
            + params["conv_v_b"][None, :, None]
        out_v = out_v.reshape(b, self.n_v * d)
        # horizontal convs: valid conv of height l over time, relu, max-pool
        # (Caser.py:244-304)
        outs = []
        x_nhwc = E[:, :, None, :]  # [B, L, 1, d] NHWC with d as channels
        for l, blk in enumerate(params["conv_h"], start=1):
            kern = blk["w"][:, None, :, :]  # [l, 1, d, n_h] HWIO
            conv = jax.lax.conv_general_dilated(
                x_nhwc, kern, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            conv = jax.nn.relu(conv[:, :, 0, :] + blk["b"])  # [B, L-l+1, n_h]
            outs.append(jnp.max(conv, axis=1))  # [B, n_h]
        out_h = jnp.concatenate(outs, axis=-1)  # [B, n_h*L]
        out = jnp.concatenate([out_v, out_h], axis=-1)
        if key is not None:
            out = dropout(key, out, self.dropout_rate, train)
        z = jax.nn.relu(out @ params["fc1_w"] + params["fc1_b"])
        return jnp.concatenate([z, params["user_emb"][users]], axis=-1)

    def _item_scores(self, params, x, items):
        """x [B, 2d] · W2[items] + b2[items]; items [B, M]."""
        w2 = params["W2"][items]  # [B, M, 2d]
        b2 = params["b2"][items]
        return jnp.einsum("bd,bmd->bm", x, w2) + b2

    def loss(self, params, batch, key):
        users, seq, pos, neg = batch  # pos/neg [B, target_len]
        k_drop, _ = jax.random.split(key)
        x = self._user_repr(params, seq, users, train=True, key=k_drop)
        pos_s = self._item_scores(params, x, pos)
        neg_s = self._item_scores(params, x, neg)
        pos_valid = (pos != 0).astype(jnp.float32)
        np_ = jnp.maximum(pos_valid.sum(), 1.0)
        # −mean log σ(pos) − mean log(1−σ(neg)) (Caser.py:152-158)
        loss = jnp.sum(jnp.logaddexp(0.0, -pos_s) * pos_valid) / np_ \
            + jnp.mean(jnp.logaddexp(0.0, neg_s))
        acc = jnp.sum((pos_s > neg_s) * pos_valid) / np_
        return loss, {"loss": loss, "acc": acc}

    # ------------------------------------------------------------------
    def extra_device_data(self, data: Interactions):
        """Sliding-window training instances (Caser.py:67-91): every user
        with > L train items contributes windows [i, i+L) with the following
        ``target_len`` items as targets (zero-padded at the sequence end)."""
        L, T = self.maxlen, self.target_len
        from acf_tpu.data import native_io
        nat = native_io.caser_windows(data.hist, data.hist_len, L, T)
        if nat is not None and len(nat[0]) > 0:
            users, seqs_a, tgts_a = nat
            return {
                "win_seq": jnp.asarray(seqs_a),
                "win_user": jnp.asarray(users),
                "win_pos": jnp.asarray(tgts_a),
            }
        seqs, us, tgts = [], [], []
        for u in range(1, data.num_users):
            n = int(data.hist_len[u])
            if n < L + 1:
                continue
            h = data.hist[u, data.hist.shape[1] - n:]
            for i in range(n - L):
                seqs.append(h[i:i + L])
                t = h[i + L:i + L + T]
                if len(t) < T:
                    t = np.r_[np.zeros(T - len(t), dtype=h.dtype), t]
                tgts.append(t)
                us.append(u)
        if not seqs:  # degenerate tiny datasets: fall back to padded hists
            for u in range(1, data.num_users):
                n = int(data.hist_len[u])
                if n < 2:
                    continue
                h = data.hist[u][-(L + 1):]
                seqs.append(np.r_[np.zeros(max(L + 1 - len(h), 0),
                                           dtype=h.dtype), h][:L])
                t = data.hist[u][-1:]
                tgts.append(np.r_[np.zeros(T - 1, dtype=h.dtype), t])
                us.append(u)
        return {
            "win_seq": jnp.asarray(np.stack(seqs).astype(np.int32)),
            "win_user": jnp.asarray(np.array(us, dtype=np.int32)),
            "win_pos": jnp.asarray(np.stack(tgts).astype(np.int32)),
        }

    def make_epoch_fn(self, optimizer, batch_size: int, num_batches: int, dev,
                      mesh=None):
        from acf_tpu.parallel.mesh import data_constrainer

        constrain = data_constrainer(mesh)
        n_windows = int(dev["win_seq"].shape[0])
        num_batches = max(n_windows // batch_size, 1)
        T = self.target_len

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(key)
            # sample_pair_epoch wraps when n_windows < batch_size
            batches = sample_pair_epoch(k_perm, n_windows, batch_size,
                                        num_batches)
            step_keys = jax.random.split(k_steps, num_batches)

            def step(c, xs):
                prm, opt = c
                idx, kk = xs
                kn, kl = jax.random.split(kk)
                users, seq, pos = constrain(
                    data["win_user"][idx], data["win_seq"][idx],
                    data["win_pos"][idx])
                hist_rows = data["hist"][users]
                negs = []
                nk = jax.random.split(kn, T)
                for t in range(T):
                    negs.append(uniform_negatives(nk[t], hist_rows,
                                                  self.num_items))
                neg = jnp.stack(negs, axis=1)  # [B, T]
                (_, aux), grads = jax.value_and_grad(
                    self.loss, has_aux=True)(prm, (users, seq, pos, neg), kl)
                updates, opt = optimizer.update(grads, opt, prm)
                prm = optax.apply_updates(prm, updates)
                return (prm, opt), aux

            (params, opt_state), auxes = jax.lax.scan(
                step, (params, opt_state), (batches, step_keys))
            return (params, opt_state), jax.tree.map(jnp.mean, auxes)

        return epoch_fn

    # ------------------------------------------------------------------
    def score_all(self, params, users, hists):
        seq = hists[:, -self.maxlen:]
        x = self._user_repr(params, seq, users, train=False)
        return x @ params["W2"].T + params["b2"]

    def score_some(self, params, users, hists, items):
        seq = hists[:, -self.maxlen:]
        x = self._user_repr(params, seq, users, train=False)
        return self._item_scores(params, x, items)

    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                seq = hists[:, -self.maxlen:]
                return self._user_repr(params, seq, users, train=False)

            def table(params):
                return params["W2"], params["b2"]

            self._fs = (user_repr, table)
        return self._fs
