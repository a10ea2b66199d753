"""Minimized repro harness for the APL fused-multi-epoch TPU worker crash.

Round-3 zoo runs reproducibly killed the TPU worker ("kernel fault", axon
runtime) when the APL epoch program — two full-catalog softmax+gumbel scans
per epoch — was itself scanned over a 25-epoch block
(Trainer.run_epochs; out/r3/zoo_apl.log). Every other model's fused blocks
run fine, so APL opts out (models/apl.py fuse_epochs=False) at 2x wall cost.

This probe isolates the faulting construct: ONE configuration per process
(the crash takes the worker down with it), driven sequentially by
scripts/apl_probe.sh. Modes:

  real   — real Video data + the actual APL model, tr.run_epochs(block):
           faithful reproduction of the r3 crash.
  synth  — a standalone jitted program with the same structure (epoch scan
           over [critic scan + generator scan], donated carry) on synthetic
           Video-shaped data, with constructs individually ablatable:
             --no-gumbel   drop the gumbel draw (use the softmax directly)
             --no-mask     drop the pad-column .at[:, 0].set(-1e30)
             --no-paux     drop the positive-mixture scatter (gen phase)
             --phase both|critic|gen
           and shrinkable: --items/--batch/--steps/--block.

Exit 0 with a "PROBE_OK" line = survived; a dead process = the crash.
"""

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from functools import partial  # noqa: E402


def run_real(args):
    from acf_tpu.data import load_dataset
    from acf_tpu.models import APL, MFBPR
    from acf_tpu.train import TrainConfig, Trainer

    data = load_dataset("video", "/root/reference/data")
    model = APL(data.num_users, data.num_items, 64)
    tr = Trainer(model, data, optax.sgd(0.05),
                 TrainConfig(batch_size=512, epochs=args.block,
                             verbose=10 ** 9))
    t0 = time.time()
    tr.run_epochs(args.block)  # the r3-crashing dispatch shape
    jax.block_until_ready(tr.params["g"]["P"])
    # materialize a fresh output: donated-carry timing caveat (CLAUDE.md)
    s = float(jnp.sum(tr.params["g"]["P"][:2]))
    return {"wall_s": round(time.time() - t0, 1), "checksum": s}


def run_synth(args):
    B, I, U, d = args.batch, args.items, 31000, 64
    steps, block, T = args.steps, args.block, 0.2
    rng = np.random.default_rng(0)
    data = {
        "pairs_u": jnp.asarray(rng.integers(1, U, 500_000, dtype=np.int32)),
        "pairs_i": jnp.asarray(rng.integers(1, I, 500_000, dtype=np.int32)),
        "hist": jnp.asarray(rng.integers(0, I, (U, 10), dtype=np.int32)),
    }
    key = jax.random.PRNGKey(0)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.05, 0.05)
    ks = jax.random.split(key, 4)
    params = {"g": {"P": u(ks[0], (U, d)), "Q": u(ks[1], (I, d))},
              "c": {"P": u(ks[2], (U, d)), "Q": u(ks[3], (I, d))}}
    opt = optax.sgd(0.05)
    opt_state = {"g": opt.init(params["g"]), "c": opt.init(params["c"])}

    def gumbel_softmax(k, probs):
        if args.no_gumbel:
            return probs
        uu = jax.random.uniform(k, probs.shape)
        g = -jnp.log(-jnp.log(uu + 1e-20) + 1e-20)
        return jax.nn.softmax((jnp.log(probs + 1e-20) + g) / T, axis=-1)

    def fake_critic(gp, users, k):
        logits = gp["P"][users] @ gp["Q"].T
        if not args.no_mask:
            logits = logits.at[:, 0].set(-1e30)
        probs = jax.nn.softmax(logits / T, axis=-1)
        return gumbel_softmax(k, probs)

    def fake_gen(gp, users, hist_rows, k):
        logits = gp["P"][users] @ gp["Q"].T
        if not args.no_mask:
            logits = logits.at[:, 0].set(-1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        if not args.no_paux:
            rows = jnp.arange(users.shape[0])[:, None]
            member = jnp.zeros_like(probs).at[rows, hist_rows].max(
                (hist_rows != 0).astype(probs.dtype))
            nuniq = jnp.maximum(jnp.sum(member, -1, keepdims=True), 1.0)
            probs = 0.8 * probs + 0.2 * member / nuniq
        return gumbel_softmax(k, probs)

    def critic_loss(cp, gp, users, items, k):
        pu, qi = cp["P"][users], cp["Q"][items]
        real = jnp.sum(pu * qi, -1)
        onehot = jax.lax.stop_gradient(fake_critic(gp, users, k))
        fake_emb = onehot @ cp["Q"]
        fake = jnp.sum(pu * fake_emb, -1)
        l2 = (2 * jnp.sum(jnp.square(pu)) + jnp.sum(jnp.square(qi))
              + jnp.sum(jnp.square(fake_emb))) / 2
        y = real - fake
        return jnp.mean(jnp.logaddexp(0.0, -y)) + 0.05 * l2

    def gen_loss(gp, cp, users, items, hist_rows, k):
        pu = jax.lax.stop_gradient(cp["P"][users])
        qi = jax.lax.stop_gradient(cp["Q"][items])
        real = jnp.sum(pu * qi, -1)
        onehot = fake_gen(gp, users, hist_rows, k)
        fake = jnp.sum(pu * (onehot @ jax.lax.stop_gradient(cp["Q"])), -1)
        y = real - fake
        return jnp.mean(-jnp.logaddexp(0.0, -y))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        k_perm, k_c, k_g = jax.random.split(key, 3)
        idx = jax.random.randint(k_perm, (steps, B), 0,
                                 data["pairs_u"].shape[0])

        def c_step(c, xs):
            cp, cos = c
            i, kk = xs
            uu, ii = data["pairs_u"][i], data["pairs_i"][i]
            _, grads = jax.value_and_grad(critic_loss)(
                cp, params["g"], uu, ii, kk)
            up, cos = opt.update(grads, cos, cp)
            return (optax.apply_updates(cp, up), cos), 0.0

        def g_step(c, xs):
            gp, gos = c
            i, kk = xs
            uu, ii = data["pairs_u"][i], data["pairs_i"][i]
            _, grads = jax.value_and_grad(gen_loss)(
                gp, c_new, uu, ii, data["hist"][uu], kk)
            up, gos = opt.update(grads, gos, gp)
            return (optax.apply_updates(gp, up), gos), 0.0

        c_new, c_os = params["c"], opt_state["c"]
        if args.phase in ("both", "critic"):
            (c_new, c_os), _ = jax.lax.scan(
                c_step, (params["c"], opt_state["c"]),
                (idx, jax.random.split(k_c, steps)))
        g_new, g_os = params["g"], opt_state["g"]
        if args.phase in ("both", "gen"):
            (g_new, g_os), _ = jax.lax.scan(
                g_step, (params["g"], opt_state["g"]),
                (idx, jax.random.split(k_g, steps)))
        return ({"g": g_new, "c": c_new}, {"g": g_os, "c": c_os}), 0.0

    @partial(jax.jit, donate_argnums=(0,))
    def multi(carry, data, keys):
        return jax.lax.scan(lambda c, k: epoch_fn(c, data, k), carry, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), block)
    t0 = time.time()
    (params, opt_state), _ = multi((params, opt_state), data, keys)
    s = float(jnp.sum(params["g"]["P"][:2]))
    return {"wall_s": round(time.time() - t0, 1), "checksum": s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("real", "synth"), default="synth")
    ap.add_argument("--block", type=int, default=25)
    ap.add_argument("--steps", type=int, default=1941)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--items", type=int, default=23744)
    ap.add_argument("--phase", choices=("both", "critic", "gen"),
                    default="both")
    ap.add_argument("--no-gumbel", action="store_true")
    ap.add_argument("--no-mask", action="store_true")
    ap.add_argument("--no-paux", action="store_true")
    args = ap.parse_args()

    out = run_real(args) if args.mode == "real" else run_synth(args)
    out.update(mode=args.mode, block=args.block, steps=args.steps,
               batch=args.batch, items=args.items, phase=args.phase,
               no_gumbel=args.no_gumbel, no_mask=args.no_mask,
               no_paux=args.no_paux)
    print("PROBE_OK " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
