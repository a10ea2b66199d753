"""APL: Adversarial Pairwise Learning (generator + critic).

Reference APL.py:52-259: a generator's full-catalog softmax produces
differentiable "fake" items via Gumbel-softmax (temperature 0.2,
APL.py:42-47); a critic scores (real, fake) dot products and trains on
``y = real − fake`` with log / wgan / hinge losses (APL.py:157-184). The
generator mixes ``p_aux`` — 0.2 spread uniformly over the user's positives —
into its distribution during its own step (APL.py:250-252). SGD(lr=0.05) for
both players; critic weight clipping ±0.05 under wgan.

The reference hardcodes a BPR checkpoint path for generator init
(APL.py:68-78) — here use ``load_params``/``init_from`` instead.

TPU redesign: both phases are batched scans; ``p_aux`` rows are built by
scatter from the padded history matrix instead of a per-batch python loop
(APL.py:250-252).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from acf_tpu.models.base import PairwiseModel
from acf_tpu.sampling.negatives import sample_pair_epoch


def gumbel_softmax(key, probs, temperature=0.2, eps=1e-20):
    """The reference's formulation (APL.py:42-47): softmax((log(p + eps) +
    gumbel) / T). Note the input is a probability vector, not raw logits."""
    u = jax.random.uniform(key, probs.shape, minval=0.0, maxval=1.0)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    return jax.nn.softmax((jnp.log(probs + eps) + g) / temperature, axis=-1)


@dataclasses.dataclass(eq=False)
class APL(PairwiseModel):
    lr: float = 0.05
    loss_function: str = "log"   # 'log' | 'wgan' | 'hinge' (APL.py:62)

    # p_aux mixture consumes hist semantically (not just for rejection) —
    # the trainer must not truncate it via membership_len
    uses_full_hist = True
    # multi-epoch fused dispatch CAPPED at 5-epoch blocks: scanning this
    # epoch program over a 25-epoch block reproducibly crashed the TPU
    # worker ("kernel fault", axon runtime — r3 zoo re-run, twice). The
    # round-4 ablation probe (scripts/apl_probe.sh, out/r4_apl_probe/)
    # minimized it: the fault needs the GENERATOR phase — i.e. gradients
    # through the full-catalog [B, I] softmax chain — at full extent
    # (23.7k items × 1941 steps × ≥~25-epoch scan); gumbel draw, pad-mask
    # scatter and p_aux mixture are each individually innocent, the
    # critic-only program is fine, and 5-epoch blocks (real model and
    # synthetic repro alike) run clean. A runtime/kernel bug at large
    # program extent, not a lexical construct — capped fusion recovers
    # most of the dispatch amortization while staying under the cliff
    # (bracketed: 12-epoch blocks clean, 18-epoch blocks crash; 5 keeps a
    # 2.4× margin in case the cliff moves with catalog/batch shape).
    max_fuse_epochs = 5

    def __post_init__(self):
        if self.loss_function not in ("log", "wgan", "hinge"):
            raise ValueError(f"apl loss_function {self.loss_function!r} not "
                             "in ('log', 'wgan', 'hinge')")
    reg_g: float = 0.0           # regs[0] (APL.py:61)
    reg_c: float = 0.05          # regs[1]
    temperature: float = 0.2
    p_aux_weight: float = 0.2    # APL.py:196, 250-252
    # closed-form generator-phase backward (see gen_step_manual): same
    # math as autodiff to float tolerance, ~1/3 the [B, I] buffer count.
    # False restores the reference-shaped autodiff formulation.
    # MEASURED round 5 (out/r5/apl_manual_ab.log, same-session A/B at full
    # Video scale): 0.99x — XLA already fuses the autodiff chain to the
    # same HBM-bound program, refuting the residual-materialization
    # hypothesis. Kept (equal speed, and it is the numerical reference for
    # the Pallas path below).
    manual_gen: bool = True
    # Pallas-fused generator chain (ops/apl_gen_fused.py): five streaming
    # passes over item tiles — only one [B, I] buffer (the stored z) ever
    # round-trips HBM vs ~6 + layout copies for the XLA paths. Same math,
    # same jax.random noise stream as gen_step_manual
    # (float-tolerance-tested).
    # MEASURED round 5 (out/r5/apl_threeway_ab2.log, same-session
    # three-way A/B at full Video scale, 500 steps/epoch): fused 3.07 s
    # vs autodiff 2.94 s per epoch = 0.96× — REJECTED as the default,
    # same standard as the SASRec fused kernels. The five sequential
    # pallas_calls re-stream the tables and redo ~9 tile matmuls; XLA's
    # fused chain overlaps its [B, I] traffic better than the traffic
    # the kernels save. Kept opt-in (the design is the right shape for a
    # future single-kernel pipeline, and it is a second independent
    # implementation of the chain used by the equivalence tests).
    fused_gen: bool = False

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.05, 0.05)
        return {
            "g": {"P": u(ks[0], (self.num_users, self.dim)),
                  "Q": u(ks[1], (self.num_items, self.dim))},
            "c": {"P": u(ks[2], (self.num_users, self.dim)),
                  "Q": u(ks[3], (self.num_items, self.dim))},
        }

    def init_opt_state(self, optimizer, params):
        return {"g": optax.sgd(self.lr).init(params["g"]),
                "c": optax.sgd(self.lr).init(params["c"])}

    # evaluation ranks with the generator (APL.py:205-211)
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

    def loss(self, params, batch, key):
        users, pos, neg = batch
        g = params["g"]
        ps = jnp.sum(g["P"][users] * g["Q"][pos], -1)
        ns = jnp.sum(g["P"][users] * g["Q"][neg], -1)
        loss = jnp.mean(jnp.logaddexp(0.0, -(ps - ns)))
        return loss, {"loss": loss, "acc": jnp.mean(ps > ns)}

    # ------------------------------------------------------------------
    def _losses(self, real, fake, g_l2, c_l2):
        """(gen_loss, critic_loss) per APL.py:157-184."""
        y = real - fake
        if self.loss_function == "wgan":
            return (-jnp.mean(fake) + self.reg_g * g_l2, jnp.mean(-y))
        if self.loss_function == "hinge":
            return (-jnp.mean(jnp.maximum(1.0 - y, 0.0)) + self.reg_g * g_l2,
                    jnp.mean(jnp.maximum(1.0 - y, 0.0)) + self.reg_c * c_l2)
        # log loss (stable): log σ(y) = −softplus(−y)
        return (jnp.mean(-jnp.logaddexp(0.0, -y)) + self.reg_g * g_l2,
                jnp.mean(jnp.logaddexp(0.0, -y)) + self.reg_c * c_l2)

    def make_epoch_fn(self, optimizer, batch_size: int, num_batches: int,
                      dev=None, mesh=None):
        from acf_tpu.parallel.mesh import data_constrainer

        constrain = data_constrainer(mesh)
        g_opt = optax.sgd(self.lr)
        c_opt = optax.sgd(self.lr)

        def fake_onehot_critic(g_params, users, key):
            """Critic-phase sampling: gumbel_softmax(softmax(logits / T))
            (APL.py:200-203); constant wrt both players' gradients here.
            The pad column 0 is masked out — the reference's softmax spans
            the real catalog only (APL.py:193-203)."""
            logits = g_params["P"][users] @ g_params["Q"].T
            logits = logits.at[:, 0].set(-1e30)
            probs = jax.nn.softmax(logits / self.temperature, axis=-1)
            return gumbel_softmax(key, probs, self.temperature)

        def fake_onehot_gen(g_params, users, hist_rows, key):
            """Generator-phase sampling with the p_aux positive mixture
            (APL.py:193-198, 250-252). Differentiable wrt g_params."""
            logits = g_params["P"][users] @ g_params["Q"].T
            logits = logits.at[:, 0].set(-1e30)  # no mass on the pad item
            probs = jax.nn.softmax(logits, axis=-1)
            b = users.shape[0]
            # uniform over UNIQUE positives (the reference builds p_aux from
            # the dok's unique keys, APL.py:250-252): set-semantics scatter,
            # then normalize — duplicate history entries must not
            # concentrate mixture mass
            rows = jnp.arange(b)[:, None]
            member = jnp.zeros_like(probs).at[rows, hist_rows].max(
                (hist_rows != 0).astype(probs.dtype))
            nuniq = jnp.maximum(jnp.sum(member, -1, keepdims=True), 1.0)
            p_aux = self.p_aux_weight * member / nuniq
            mixed = (1.0 - self.p_aux_weight) * probs + p_aux
            return gumbel_softmax(key, mixed, self.temperature)

        def critic_step_loss(c_params, g_params, users, items, key):
            pu = c_params["P"][users]
            qi = c_params["Q"][items]
            real = jnp.sum(pu * qi, -1)
            onehot = jax.lax.stop_gradient(
                fake_onehot_critic(g_params, users, key))
            fake_emb = onehot @ c_params["Q"]
            fake = jnp.sum(pu * fake_emb, -1)
            # the reference accumulates l2(u_embedding) in BOTH the real and
            # fake scopes (APL.py:132 then += at :140), so the user rows are
            # regularized twice
            c_l2 = (2 * jnp.sum(jnp.square(pu)) + jnp.sum(jnp.square(qi))
                    + jnp.sum(jnp.square(fake_emb))) / 2
            _, c_loss = self._losses(real, fake, 0.0, c_l2)
            return c_loss

        # Rematting the generator sampling chain was measured and REJECTED
        # (scripts/apl_remat_probe.py, out/r4/apl_remat_probe.json:
        # same-session A/B 6.32 s vs 3.99 s per epoch = 0.63×): the
        # hypothesis was that skipping the saved [B, I] residuals would
        # beat re-paying one [B,d]×[d,I] matmul, but XLA's stock backward
        # schedule already wins — recomputing the full
        # softmax → mix → gumbel chain costs more HBM traffic than the
        # residual loads it avoids. Off by default; kept as an opt-in knob
        # so the measurement is one flag away on future hardware.
        sample_gen = (jax.checkpoint(fake_onehot_gen)
                      if getattr(self, "remat_gen", False)
                      else fake_onehot_gen)

        def gen_step_loss(g_params, c_params, users, items, hist_rows, key):
            pu = jax.lax.stop_gradient(c_params["P"][users])
            qi = jax.lax.stop_gradient(c_params["Q"][items])
            real = jnp.sum(pu * qi, -1)
            onehot = sample_gen(g_params, users, hist_rows, key)
            fake_emb = onehot @ jax.lax.stop_gradient(c_params["Q"])
            fake = jnp.sum(pu * fake_emb, -1)
            g_l2 = (jnp.sum(jnp.square(g_params["P"][users]))
                    + jnp.sum(jnp.square(g_params["Q"]))) / 2
            g_loss, _ = self._losses(real, fake, g_l2, 0.0)
            return g_loss

        def gen_step_manual(g_params, c_params, users, items, hist_rows,
                            key):
            """Closed-form generator-phase gradients (round-5; VERDICT r4
            #2). Autodiff through the [B, I] softmax→mix→gumbel-softmax
            chain materializes a residual per primitive plus layout copies
            (48% of the gen step was transpose/copy in the r4 op profile,
            out/r4/apl_profile.jsonl). The chain's true backward is two
            softmax VJP rules and a reciprocal — all rowwise:

              fake_b       = Σ_i s_bi · c_bi,  c = pu_c Qc^T, s = softmax(z)
              ∂L/∂z_bi     = s_bi · a_b · (c_bi − fake_b)       (softmax VJP)
              ∂L/∂mixed    = ∂L/∂z / (T · (mixed + ε))          (z = (log(mixed+ε)+g)/T)
              ∂L/∂probs    = (1 − w) · ∂L/∂mixed                (p_aux affine)
              ∂L/∂logits   = probs ∘ (r − ⟨probs, r⟩)           (softmax VJP)
              ∂L/∂P[u]     = ∂L/∂logits · Q_g (+ reg rows)
              ∂L/∂Q_g      = ∂L/∂logits^T · P[u] (+ reg)

            with a_b = ∂L/∂fake_b autodiffed through the tiny [B] loss
            head only. Math identical to autodiff (float-tolerance-tested
            against it, tests/test_gan_models.py); the hand-scheduled
            program holds ~4 [B, I] buffers instead of ~12."""
            d = self.dim
            w, T, eps = self.p_aux_weight, self.temperature, 1e-20
            pu_g = g_params["P"][users]                       # [B, d]
            Qg = g_params["Q"]                                # [I, d]
            logits = jax.lax.dot_general(                     # [B, I]
                pu_g, Qg, (((1,), (1,)), ((), ())))
            logits = logits.at[:, 0].set(-1e30)
            probs = jax.nn.softmax(logits, axis=-1)

            b = users.shape[0]
            rows = jnp.arange(b)[:, None]
            member = jnp.zeros_like(probs).at[rows, hist_rows].max(
                (hist_rows != 0).astype(probs.dtype))
            nuniq = jnp.maximum(jnp.sum(member, -1, keepdims=True), 1.0)
            mixed = (1.0 - w) * probs + w * member / nuniq

            un = jax.random.uniform(key, probs.shape, minval=0.0,
                                    maxval=1.0)
            gn = -jnp.log(-jnp.log(un + eps) + eps)
            s = jax.nn.softmax((jnp.log(mixed + eps) + gn) / T, axis=-1)

            pu_c = c_params["P"][users]
            cs = jax.lax.dot_general(                          # [B, I]
                pu_c, c_params["Q"], (((1,), (1,)), ((), ())))
            fake = jnp.sum(s * cs, -1)
            real = jnp.sum(pu_c * c_params["Q"][items], -1)

            def head(fake_):
                gl, _ = self._losses(real, fake_, 0.0, 0.0)
                return gl

            g_main, a = jax.value_and_grad(head)(fake)

            dz = s * (a[:, None] * (cs - fake[:, None]))
            r = ((1.0 - w) / T) * dz / (mixed + eps)
            dlogits = probs * (r - jnp.sum(probs * r, -1, keepdims=True))

            gP_rows = dlogits @ Qg + self.reg_g * pu_g        # [B, d]
            gP = jnp.zeros_like(g_params["P"]).at[users].add(gP_rows)
            gQ = jax.lax.dot_general(                          # [I, d]
                dlogits, pu_g, (((0,), (0,)), ((), ())))
            gQ = gQ + self.reg_g * Qg
            g_l2 = (jnp.sum(jnp.square(pu_g)) + jnp.sum(jnp.square(Qg))) / 2
            return g_main + self.reg_g * g_l2, {"P": gP, "Q": gQ}

        def gen_step_fused(g_params, c_params, users, items, hist_rows,
                           key):
            """gen_step_manual's math through the Pallas streaming kernels
            (ops/apl_gen_fused.py): identical jax.random noise stream,
            member/nuniq built the same way; the [B, I] chain never lands
            in HBM except the stored z buffer."""
            from acf_tpu.ops.apl_gen_fused import (
                apl_gen_backward, apl_gen_forward,
            )

            w, T, eps = self.p_aux_weight, self.temperature, 1e-20
            pu_g = g_params["P"][users]
            Qg = g_params["Q"]
            pu_c = c_params["P"][users]
            Qc = c_params["Q"]
            b = users.shape[0]
            rows = jnp.arange(b)[:, None]
            # bfloat16: 0/1 exact, half the f32 HBM traffic — and Mosaic
            # has no uint8->f32 cast (first TPU compile of the kernel
            # failed on exactly that)
            member = jnp.zeros((b, self.num_items), jnp.bfloat16).at[
                rows, hist_rows].max((hist_rows != 0).astype(jnp.bfloat16))
            nuniq = jnp.maximum(
                member.astype(jnp.float32).sum(-1), 1.0)
            un = jax.random.uniform(key, (b, self.num_items), minval=0.0,
                                    maxval=1.0)
            gn = -jnp.log(-jnp.log(un + eps) + eps)
            interpret = jax.default_backend() == "cpu"

            fake, res = apl_gen_forward(
                pu_g, Qg, pu_c, Qc, member, nuniq, gn,
                w=w, temperature=T, interpret=interpret)
            real = jnp.sum(pu_c * Qc[items], -1)

            def head(fake_):
                gl, _ = self._losses(real, fake_, 0.0, 0.0)
                return gl

            g_main, a = jax.value_and_grad(head)(fake)
            dP_rows, dQ = apl_gen_backward(
                pu_g, pu_c, nuniq, a, res,
                w=w, temperature=T, interpret=interpret)
            gP = jnp.zeros_like(g_params["P"]).at[users].add(
                dP_rows + self.reg_g * pu_g)
            gQ = dQ[: self.num_items] + self.reg_g * Qg
            g_l2 = (jnp.sum(jnp.square(pu_g)) + jnp.sum(jnp.square(Qg))) / 2
            return g_main + self.reg_g * g_l2, {"P": gP, "Q": gQ}

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(carry, data, key):
            params, opt_state = carry
            k_perm, k_c, k_g = jax.random.split(key, 3)
            n = data["pairs_u"].shape[0]
            batches = sample_pair_epoch(k_perm, n, batch_size, num_batches)

            def c_step(c, xs):
                c_params, c_os = c
                idx, kk = xs
                u, i = constrain(data["pairs_u"][idx], data["pairs_i"][idx])
                cl, grads = jax.value_and_grad(critic_step_loss)(
                    c_params, params["g"], u, i, kk)
                up, c_os = c_opt.update(grads, c_os, c_params)
                c_params = optax.apply_updates(c_params, up)
                if self.loss_function == "wgan":
                    c_params = jax.tree.map(
                        lambda x: jnp.clip(x, -0.05, 0.05), c_params)
                return (c_params, c_os), cl

            c_keys = jax.random.split(k_c, num_batches)
            (c_new, c_os), c_losses = jax.lax.scan(
                c_step, (params["c"], opt_state["c"]), (batches, c_keys))

            def g_step(c, xs):
                g_params, g_os = c
                idx, kk = xs
                u, i = constrain(data["pairs_u"][idx], data["pairs_i"][idx])
                hist_rows = data["hist"][u]
                if getattr(self, "fused_gen", False) and mesh is None:
                    gl, grads = gen_step_fused(
                        g_params, c_new, u, i, hist_rows, kk)
                elif self.manual_gen and mesh is None:
                    gl, grads = gen_step_manual(
                        g_params, c_new, u, i, hist_rows, kk)
                else:
                    # autodiff path: reference formulation kept verbatim
                    # (also the GSPMD-mesh path — the manual program's
                    # hand-scheduled scatters are single-device-tuned)
                    gl, grads = jax.value_and_grad(gen_step_loss)(
                        g_params, c_new, u, i, hist_rows, kk)
                up, g_os = g_opt.update(grads, g_os, g_params)
                return (optax.apply_updates(g_params, up), g_os), gl

            g_keys = jax.random.split(k_g, num_batches)
            (g_new, g_os), g_losses = jax.lax.scan(
                g_step, (params["g"], opt_state["g"]), (batches, g_keys))

            stats = {"loss": jnp.mean(g_losses), "d_loss": jnp.mean(c_losses),
                     "acc": jnp.float32(0.0)}
            return ({"g": g_new, "c": c_new}, {"g": g_os, "c": c_os}), stats

        return epoch_fn
