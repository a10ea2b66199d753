"""Popularity-discriminator adversarial training (AMF / ABPR / ANeuMF).

The reference attaches small MLP discriminators that classify
popular-vs-rare user/item embeddings, and trains the recommender to *confuse*
them (label swap) while still fitting interactions:

  * ``AdversarialMatrixFactorisation`` (reference MF.py:62-289): two
    discriminators on the user/item tables, pop split by ``pop_percent``
    over sorted interaction counts (MF.py:272-289); per minibatch the
    discriminators take a popular-batch (label 1) and a rare-batch (label 0)
    step (MF.py:127-153), then the joint model trains with
    ``loss_weights=[1, w, w]`` on swapped labels (MF.py:159-189).
  * ``AdversarialBPR`` (BPR.py:105-176) — same machinery over the BPR base.
  * ``AdversarialNeuMF`` (NeuMF.py:58-185) — four discriminators (MF-u,
    MF-i, MLP-u, MLP-i).

Here this is ONE generic wrapper: any base model that exposes
``adv_encoders()`` (name → (kind, encode_fn, emb_dim)) gets the full
machinery, with both discriminator and generator phases fused into the same
jitted epoch scan (the reference pays 8+ ``train_on_batch``/``predict``
calls per minibatch, MF.py:127-190).

Deliberate deviation: the discriminator and generator updates here are two
*sequential* optax updates inside one step (disc first, then the recommender
against the updated discriminator), matching the reference's call order but
with a single fused dispatch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acf_tpu.data.datasets import Interactions
from acf_tpu.models.base import PairwiseModel
from acf_tpu.nn.layers import dense, init_dense
from acf_tpu.sampling.negatives import sample_pair_epoch, uniform_negatives


def _bce_with_logits(logits, labels):
    return jnp.mean(jnp.logaddexp(0.0, logits) - labels * logits)


def disc_forward(dp, x):
    """2-layer MLP discriminator: dim → dim (relu) → 1 logit
    (reference MF.py:262-270)."""
    h = jax.nn.relu(dense(dp["l1"], x))
    return dense(dp["l2"], h)[..., 0]


def popularity_split(counts: np.ndarray, pop_percent: float):
    """ids sorted by count desc; first ``pop_percent`` fraction are popular
    (reference MF.py:272-289). Only ids with count > 0 participate."""
    ids = np.nonzero(counts > 0)[0]
    order = ids[np.argsort(-counts[ids], kind="stable")]
    k = int(len(order) * pop_percent)
    popular = order[:max(k, 1)]
    rare = order[max(k, 1):]
    if len(rare) == 0:
        rare = popular
    return popular.astype(np.int32), rare.astype(np.int32)


@dataclasses.dataclass(eq=False)
class PopularityAdversarial(PairwiseModel):
    """Wrap ``base`` with popularity discriminators on its embedding towers."""

    base: Any = None
    weight: float = 0.001       # reference --w
    pop_percent: float = 0.2    # reference --pp
    disc_lr: float = 0.001      # keras Adam default
    # True = FastAdversarialMF semantics (keras_adversarial
    # AdversarialOptimizerSimultaneous, reference FastAdversarialMF.py:64-74):
    # both players step from the SAME pre-update parameters. False = the
    # AMF/ABPR sequential protocol (disc first, reference MF.py:118-190).
    simultaneous: bool = False

    def __post_init__(self):
        assert hasattr(self.base, "adv_encoders"), (
            f"{type(self.base).__name__} does not expose adv_encoders()")
        self.encoders = self.base.adv_encoders()
        if hasattr(self.base, "eval_batch_users"):
            self.eval_batch_users = self.base.eval_batch_users

    # -- params -------------------------------------------------------------
    def init_params(self, key):
        kb, kd = jax.random.split(key)
        disc = {}
        for name, (kind, enc, edim) in self.encoders.items():
            k1, k2, kd = jax.random.split(kd, 3)
            disc[name] = {"l1": init_dense(k1, edim, edim),
                          "l2": init_dense(k2, edim, 1)}
        return {"base": self.base.init_params(kb), "disc": disc}

    def init_opt_state(self, optimizer, params):
        return {"base": optimizer.init(params["base"]),
                "disc": self._disc_opt().init(params["disc"])}

    def _disc_opt(self):
        return optax.adam(self.disc_lr)

    # -- data hooks ---------------------------------------------------------
    def extra_device_data(self, data: Interactions):
        user_counts = np.bincount(data.pairs_u, minlength=data.num_users)
        item_counts = np.bincount(data.pairs_i, minlength=data.num_items)
        pu, ru = popularity_split(user_counts, self.pop_percent)
        pi, ri = popularity_split(item_counts, self.pop_percent)
        return {"pop_u": jnp.asarray(pu), "rare_u": jnp.asarray(ru),
                "pop_i": jnp.asarray(pi), "rare_i": jnp.asarray(ri)}

    # -- scoring delegates --------------------------------------------------
    def score_all(self, params, users, hists):
        return self.base.score_all(params["base"], users, hists)

    def score_some(self, params, users, hists, items):
        return self.base.score_some(params["base"], users, hists, items)

    def loss(self, params, batch, key):
        return self.base.loss(params["base"], batch, key)

    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            base_fs = self.base.factored_scorer()
            if base_fs is None:
                self._fs = None
            else:
                ur, tb = base_fs

                def user_repr(params, users, hists):
                    return ur(params["base"], users, hists)

                def table(params):
                    return tb(params["base"])

                self._fs = (user_repr, table)
        return self._fs

    # -- the fused epoch ----------------------------------------------------
    def make_epoch_fn(self, optimizer, batch_size: int, num_batches: int,
                      dev=None, mesh=None):
        from acf_tpu.parallel.mesh import data_constrainer

        constrain = data_constrainer(mesh)
        disc_opt = self._disc_opt()
        half = batch_size // 2

        def sample_ids(key, pool, n):
            idx = jax.random.randint(key, (n,), 0, pool.shape[0])
            return pool[idx]

        def d_loss_fn(disc_params, base_params, pop_ids, rare_ids):
            total = 0.0
            for name, (kind, enc, _) in self.encoders.items():
                pop = jax.lax.stop_gradient(
                    enc(base_params, pop_ids["u" if kind == "user" else "i"]))
                rare = jax.lax.stop_gradient(
                    enc(base_params, rare_ids["u" if kind == "user" else "i"]))
                total = total + _bce_with_logits(
                    disc_forward(disc_params[name], pop), jnp.ones(pop.shape[0]))
                total = total + _bce_with_logits(
                    disc_forward(disc_params[name], rare), jnp.zeros(rare.shape[0]))
            return total / (2 * len(self.encoders))

        def g_loss_fn(base_params, disc_params, batch, adv_ids, key):
            main, aux = self.base.loss(base_params, batch, key)
            # label swap: popular → 0, rare → 1 (reference MF.py:179-189)
            y = jnp.concatenate([jnp.zeros(half), jnp.ones(half)])
            adv = 0.0
            for name, (kind, enc, _) in self.encoders.items():
                ids = adv_ids["u" if kind == "user" else "i"]
                emb = enc(base_params, ids)
                dp = jax.lax.stop_gradient(disc_params[name])
                adv = adv + _bce_with_logits(disc_forward(dp, emb), y)
            total = main + self.weight * adv
            return total, aux

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(key)
            n = data["pairs_u"].shape[0]
            batches = sample_pair_epoch(k_perm, n, batch_size, num_batches)
            step_keys = jax.random.split(k_steps, num_batches)

            def step(c, xs):
                prm, opt = c
                idx, kk = xs
                ks = jax.random.split(kk, 10)
                u, pos = constrain(data["pairs_u"][idx], data["pairs_i"][idx])
                neg = uniform_negatives(ks[0], data["hist"][u], self.num_items)
                batch = (u, pos, neg)

                # 1. discriminator step (popular → 1, rare → 0); the pool
                # draws are batch-shaped, so they data-shard like the batch
                pop_ids = {"u": constrain(
                               sample_ids(ks[1], data["pop_u"], batch_size)),
                           "i": constrain(
                               sample_ids(ks[2], data["pop_i"], batch_size))}
                rare_ids = {"u": constrain(
                                sample_ids(ks[3], data["rare_u"], batch_size)),
                            "i": constrain(
                                sample_ids(ks[4], data["rare_i"], batch_size))}
                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                    prm["disc"], prm["base"], pop_ids, rare_ids)
                d_up, d_opt = disc_opt.update(d_grads, opt["disc"], prm["disc"])
                disc_new = optax.apply_updates(prm["disc"], d_up)

                # 2. recommender step — against the updated discriminator
                # (sequential, AMF) or the pre-update one (simultaneous,
                # FastAdversarialMF)
                disc_for_g = prm["disc"] if self.simultaneous else disc_new
                # distinct keys per pool: reusing one key across the user and
                # item draws would make the index vectors monotone transforms
                # of each other (rank-correlated user/item pairs every step)
                adv_ids = {
                    "u": constrain(jnp.concatenate([
                        sample_ids(ks[5], data["pop_u"], half),
                        sample_ids(ks[6], data["rare_u"], half)])),
                    "i": constrain(jnp.concatenate([
                        sample_ids(ks[8], data["pop_i"], half),
                        sample_ids(ks[9], data["rare_i"], half)])),
                }
                (_, aux), g_grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(
                    prm["base"], disc_for_g, batch, adv_ids, ks[7])
                g_up, b_opt = optimizer.update(g_grads, opt["base"], prm["base"])
                base_new = optax.apply_updates(prm["base"], g_up)

                aux = dict(aux)
                aux["d_loss"] = d_loss
                return ({"base": base_new, "disc": disc_new},
                        {"base": b_opt, "disc": d_opt}), aux

            (params, opt_state), auxes = jax.lax.scan(
                step, (params, opt_state), (batches, step_keys))
            return (params, opt_state), jax.tree.map(jnp.mean, auxes)

        return epoch_fn
