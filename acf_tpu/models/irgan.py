"""IRGAN: generator-discriminator minimax over matrix factorization.

Reference IRGAN.py:9-273: generator G softmax-samples "fake" items from its
full-catalog dot-product distribution; discriminator D is trained with
sigmoid CE on (positive, G-sampled) items; G is trained by policy gradient
with reward ``2(σ(D(u,i)) − 0.5)`` importance-weighted by ``p/pn`` where pn
mixes λ=0.2 of the user's positives into G's distribution
(IRGAN.py:81-110). Both use SGD(lr=0.001), embeddings init U(±0.05).

TPU redesign: the reference's per-user python loops (one ``sess.run`` +
``np.random.choice`` per user, IRGAN.py:81-134) become per-pair batches:
each train pair contributes one D-negative sampled by Gumbel-max from G's
temperature-0.2 softmax row, and two G-samples from the mixture pn — exact
categorical sampling on device, one [B, I] logits matmul per step. The epoch
preserves the reference's phase order: a full D pass, then a full G pass.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from acf_tpu.models.base import PairwiseModel
from acf_tpu.sampling.negatives import sample_pair_epoch


def _gumbel(key, shape):
    u = jax.random.uniform(key, shape, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


@dataclasses.dataclass(eq=False)
class IRGAN(PairwiseModel):
    init_delta: float = 0.05
    d_lr: float = 0.001
    g_lr: float = 0.001
    temperature: float = 0.2      # D-negative sampling (IRGAN.py:118)
    sample_lambda: float = 0.2    # pn mixture weight (IRGAN.py:83)
    lamda_d: float = 0.1          # / batch_size at runtime (IRGAN.py:20)
    lamda_g: float = 0.0
    # True = DIS2/train2 variant (IRGAN.py:58-68, 277-343): the
    # discriminator trains on pairwise softplus(pos − G-sampled neg)
    # instead of pointwise sigmoid CE.
    pairwise_d: bool = False
    # positive-mixture sampling + importance density consume hist
    # semantically — exempt from the trainer's membership_len cap
    uses_full_hist = True

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        shape_u = (self.num_users, self.dim)
        shape_i = (self.num_items, self.dim)
        u = lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                            -self.init_delta, self.init_delta)
        return {
            "g": {"P": u(ks[0], shape_u), "Q": u(ks[1], shape_i)},
            "d": {"P": u(ks[2], shape_u), "Q": u(ks[3], shape_i)},
        }

    def init_opt_state(self, optimizer, params):
        # the reference ignores the outer optimizer: both players use SGD
        return {"g": optax.sgd(self.g_lr).init(params["g"]),
                "d": optax.sgd(self.d_lr).init(params["d"])}

    # -- scoring: evaluation ranks with the generator (IRGAN.py:36-39) ----
    def score_all(self, params, users, hists):
        return params["g"]["P"][users] @ params["g"]["Q"].T

    def score_some(self, params, users, hists, items):
        return jnp.einsum("bd,bmd->bm", params["g"]["P"][users],
                          params["g"]["Q"][items])

    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                return params["g"]["P"][users]

            def table(params):
                return params["g"]["Q"], None

            self._fs = (user_repr, table)
        return self._fs

    def loss(self, params, batch, key):  # generator BPR-proxy, for reporting
        users, pos, neg = batch
        g = params["g"]
        ps = jnp.sum(g["P"][users] * g["Q"][pos], -1)
        ns = jnp.sum(g["P"][users] * g["Q"][neg], -1)
        loss = jnp.mean(jnp.logaddexp(0.0, -(ps - ns)))
        return loss, {"loss": loss, "acc": jnp.mean(ps > ns)}

    # ------------------------------------------------------------------
    def make_epoch_fn(self, optimizer, batch_size: int, num_batches: int,
                      dev=None, mesh=None):
        from acf_tpu.parallel.mesh import data_constrainer

        constrain = data_constrainer(mesh)
        d_opt = optax.sgd(self.d_lr)
        g_opt = optax.sgd(self.g_lr)
        lam_d = self.lamda_d / batch_size
        lam_g = self.lamda_g / batch_size

        def g_row_logits(g_params, users):
            # the reference's softmax spans the iNum REAL items
            # (IRGAN.py:186-192); our catalog carries the pad id 0, which
            # must get no probability mass — otherwise Gumbel-max can emit
            # item 0 as a fake/policy sample and the partition function is
            # off by the pad column
            logits = g_params["P"][users] @ g_params["Q"].T  # [B, I]
            return logits.at[:, 0].set(-1e30)

        def d_loss_fn(d_params, users, items, labels):
            pu = d_params["P"][users]
            qi = d_params["Q"][items]
            logits = jnp.sum(pu * qi, -1)
            ce = jnp.logaddexp(0.0, logits) - labels * logits
            reg = lam_d * (jnp.sum(jnp.square(pu)) / 2
                           + jnp.sum(jnp.square(qi)) / 2)
            # the reference's pre_loss is a [B] vector with the scalar reg
            # broadcast onto it; minimize() differentiates its SUM
            # (IRGAN.py:250-256) → sum(ce) + B·reg, not a mean
            return jnp.sum(ce) + labels.shape[0] * reg

        def d_pair_loss_fn(d_params, users, pos, neg):
            """DIS2: sum softplus(-(D(u,pos) − D(u,neg))) per coordinate
            (IRGAN.py:318-326 keeps the element-wise difference)."""
            pu = d_params["P"][users]
            diff = pu * (d_params["Q"][pos] - d_params["Q"][neg])
            return jnp.sum(jnp.logaddexp(0.0, -diff))

        def g_loss_fn(g_params, d_params, users, items, reward):
            # -mean(log softmax_prob[i] * reward) + reg (IRGAN.py:194-198)
            logits = g_row_logits(g_params, users)  # [B, I]
            logp = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(logp, items, axis=1)  # [B, S]
            pu = g_params["P"][users]
            qi = g_params["Q"][items]
            reg = lam_g * (jnp.sum(jnp.square(pu)) / 2
                           + jnp.sum(jnp.square(qi)) / 2)
            return -jnp.mean(lp * reward) + reg

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt_state = carry
            k_perm, k_d, k_g = jax.random.split(key, 3)
            n = data["pairs_u"].shape[0]
            batches = sample_pair_epoch(k_perm, n, batch_size, num_batches)

            # ---- phase 1: discriminator over all batches ----
            def d_step(c, xs):
                d_params, d_os, g_params = c
                idx, kk = xs
                u, pos = constrain(data["pairs_u"][idx],
                                   data["pairs_i"][idx])
                # fake item ~ softmax(G(u)/T) via Gumbel-max (exact)
                logits = g_row_logits(g_params, u) / self.temperature
                fake = jnp.argmax(logits + _gumbel(kk, logits.shape),
                                  axis=-1).astype(jnp.int32)
                if self.pairwise_d:
                    dl, grads = jax.value_and_grad(d_pair_loss_fn)(
                        d_params, u, pos, fake)
                else:
                    users2 = jnp.concatenate([u, u])
                    items2 = jnp.concatenate([pos, fake])
                    labels = jnp.concatenate([jnp.ones_like(u, jnp.float32),
                                              jnp.zeros_like(u, jnp.float32)])
                    dl, grads = jax.value_and_grad(d_loss_fn)(
                        d_params, users2, items2, labels)
                up, d_os = d_opt.update(grads, d_os, d_params)
                return (optax.apply_updates(d_params, up), d_os, g_params), dl

            d_keys = jax.random.split(k_d, num_batches)
            (d_new, d_os, _), d_losses = jax.lax.scan(
                d_step, (params["d"], opt_state["d"], params["g"]),
                (batches, d_keys))

            # ---- phase 2: generator policy gradient over all batches ----
            def g_step(c, xs):
                g_params, g_os = c
                idx, kk = xs
                k1, k2, k3 = jax.random.split(kk, 3)
                u = constrain(data["pairs_u"][idx])
                hist_rows = data["hist"][u]  # for the positive mixture
                logits = g_row_logits(g_params, u)
                prob = jax.nn.softmax(logits, axis=-1)  # [B, I]
                # pn = (1-λ) p + λ·uniform(user positives)
                hist_len = jnp.maximum(
                    jnp.sum(hist_rows != 0, -1, keepdims=True), 1)
                # 2 samples per pair (reference: 2|pos| per user)
                S = 2
                ks_mix = jax.random.bernoulli(
                    k1, self.sample_lambda, (u.shape[0], S))
                cat = jnp.argmax(
                    jnp.log(jnp.maximum(prob, 1e-20))[:, None, :]
                    + _gumbel(k2, (u.shape[0], S, prob.shape[1])), axis=-1)
                pos_idx = jax.random.randint(k3, (u.shape[0], S), 0,
                                             jnp.iinfo(jnp.int32).max)
                L = hist_rows.shape[1]
                pos_pick = jnp.take_along_axis(
                    hist_rows, L - 1 - (pos_idx % hist_len), axis=1)
                sample = jnp.where(ks_mix, pos_pick, cat).astype(jnp.int32)

                p_i = jnp.take_along_axis(prob, sample, axis=1)
                # pn[i] = (1-λ) p[i] + λ·m_i/|hist| where m_i is the item's
                # multiplicity in the history row: our positive pick draws a
                # uniform POSITION, so an item visited m times has proposal
                # mass λ·m/|hist| — the density must match or the importance
                # weights p/pn bias toward repeat items. (The reference
                # samples from unique dok keys, IRGAN.py:84-90, where m ≡ 1
                # and this reduces to λ/|pos|.)
                mult = jnp.sum(
                    (sample[:, :, None] == hist_rows[:, None, :]), -1)
                pn_i = (1 - self.sample_lambda) * p_i + \
                    self.sample_lambda / hist_len * mult
                d_scores = jnp.sum(d_new["P"][u][:, None, :]
                                   * d_new["Q"][sample], -1)
                reward = 2.0 * (jax.nn.sigmoid(d_scores) - 0.5)
                reward = reward * p_i / jnp.maximum(pn_i, 1e-20)
                reward = jax.lax.stop_gradient(reward)
                gl, grads = jax.value_and_grad(g_loss_fn)(
                    g_params, d_new, u, sample, reward)
                up, g_os = g_opt.update(grads, g_os, g_params)
                return (optax.apply_updates(g_params, up), g_os), gl

            g_keys = jax.random.split(k_g, num_batches)
            (g_new, g_os), g_losses = jax.lax.scan(
                g_step, (params["g"], opt_state["g"]), (batches, g_keys))

            stats = {"loss": jnp.mean(g_losses), "d_loss": jnp.mean(d_losses),
                     "acc": jnp.float32(0.0)}
            return ({"g": g_new, "d": d_new}, {"g": g_os, "d": d_os}), stats

        return epoch_fn
