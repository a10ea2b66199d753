"""NeuMF: GMF (element-wise product) + MLP tower → sigmoid prediction.

Reference NeuMF.py:10-56: separate MF and MLP embedding pairs, MLP layer
sizes [d, 2d, d] applied to the concatenated user/item MLP embeddings, final
1-unit sigmoid Dense over [gmf_vector ; mlp_vector]; pointwise binary
cross-entropy with one sampled negative per positive (via
MF.get_train_instances, MF.py:42-56). Adam optimizer.

The adversarial variant (AdversarialNeuMF, NeuMF.py:58-185) attaches four
popularity discriminators — see :mod:`acf_tpu.adversarial.popularity`, which
wraps this model generically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from acf_tpu.models.base import PairwiseModel
from acf_tpu.nn.layers import dense, init_dense


def _keras_uniform(key, shape, scale=0.05):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


@dataclasses.dataclass(eq=False)
class NeuMF(PairwiseModel):
    """dim == the reference's ``mf_dim``; MLP layers are [2d→2d, 2d→d]
    applied after concat (NeuMF.py:15, 40-42: layers [d, 2d, d] where
    layer 0 is the concat width d+d)."""

    def init_params(self, key):
        d = self.dim
        ks = jax.random.split(key, 8)
        return {
            "P_mf": _keras_uniform(ks[0], (self.num_users, d)),
            "Q_mf": _keras_uniform(ks[1], (self.num_items, d)),
            "P_mlp": _keras_uniform(ks[2], (self.num_users, d)),
            "Q_mlp": _keras_uniform(ks[3], (self.num_items, d)),
            "mlp1": init_dense(ks[4], 2 * d, 2 * d),
            "mlp2": init_dense(ks[5], 2 * d, d),
            "out": init_dense(ks[6], 2 * d, 1),
        }

    def _logits(self, params, users, items):
        gmf = params["P_mf"][users] * params["Q_mf"][items]
        mlp = jnp.concatenate(
            [params["P_mlp"][users], params["Q_mlp"][items]], axis=-1)
        mlp = jax.nn.relu(dense(params["mlp1"], mlp))
        mlp = jax.nn.relu(dense(params["mlp2"], mlp))
        vec = jnp.concatenate([gmf, mlp], axis=-1)
        return dense(params["out"], vec)[..., 0]

    def loss(self, params, batch, key):
        users, pos, neg = batch
        pos_l = self._logits(params, users, pos)
        neg_l = self._logits(params, users, neg)
        logits = jnp.concatenate([pos_l, neg_l])
        labels = jnp.concatenate([jnp.ones_like(pos_l), jnp.zeros_like(neg_l)])
        loss = jnp.mean(jnp.logaddexp(0.0, logits) - labels * logits)
        acc = jnp.mean((pos_l - neg_l) > 0)
        return loss, {"loss": loss, "acc": acc}

    # memory hint for the evaluator: the MLP tower materializes
    # [B, chunk, 2d] activations per item chunk
    eval_batch_users = 128
    _item_chunk = 4096

    def score_all(self, params, users, hists):
        """Full catalog via item-chunked tower evaluation.

        The MLP tower prevents a single matmul over the catalog, so items are
        scored in chunks under ``lax.map`` — still one fused device
        computation per user tile (vs the reference's per-user ``predict``
        python loop, run.py:248 → evaluation.py:54-76).
        """
        num_items = params["Q_mf"].shape[0]
        b = users.shape[0]
        c = self._item_chunk
        n_chunks = -(-num_items // c)
        items = jnp.arange(n_chunks * c, dtype=jnp.int32).reshape(n_chunks, c)
        items = jnp.minimum(items, num_items - 1)  # pad chunk clamps in-range

        def chunk_fn(chunk_items):  # [C] -> [B, C]
            u = jnp.broadcast_to(users[:, None], (b, c))
            it = jnp.broadcast_to(chunk_items[None, :], (b, c))
            return self._logits(params, u, it)

        out = jax.lax.map(chunk_fn, items)  # [n_chunks, B, C]
        return out.transpose(1, 0, 2).reshape(b, n_chunks * c)[:, :num_items]

    def score_some(self, params, users, hists, items):
        b, m = items.shape
        u = jnp.repeat(users[:, None], m, axis=1)
        return self._logits(params, u.reshape(-1), items.reshape(-1)).reshape(b, m)

    def adv_encoders(self):
        """AdversarialNeuMF attaches 4 discriminators: MF-user, MF-item,
        MLP-user, MLP-item (reference NeuMF.py:71-100)."""
        d = self.dim
        return {
            "mf_u": ("user", lambda p, ids: p["P_mf"][ids], d),
            "mf_i": ("item", lambda p, ids: p["Q_mf"][ids], d),
            "mlp_u": ("user", lambda p, ids: p["P_mlp"][ids], d),
            "mlp_i": ("item", lambda p, ids: p["Q_mlp"][ids], d),
        }
