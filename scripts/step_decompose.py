"""Decompose the dense APR train-step cost (ml-1m shape, the bench.py
workload) into its components by timing ablated epoch programs.

Variants (all bs 512, 200-step scan, stats-materialization sync):
  full        — the bench.py APR step (sampling + FGSM + Adagrad)
  clean       — BPR only (no FGSM second grad)
  fixed-neg   — APR with the rejection sampler replaced by a raw randint
  sgd         — APR with Adagrad replaced by SGD (isolates optimizer-slot
                table passes)
  noop        — gather-and-sum only (scan + dispatch floor)

Prints one JSON line per variant. Differences between adjacent variants
estimate each component's share.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from acf_tpu.models.mf import MFBPR  # noqa: E402
from acf_tpu.sampling.negatives import (  # noqa: E402
    sample_pair_epoch, uniform_negatives,
)

U, I, D, BS = 6_041, 3_707, 64, 512
# 1941 = ml-1m's real batches/epoch; short grids inflate every variant by the
# fixed per-dispatch cost of the axon tunnel (~10-20 ms/call / STEPS)
STEPS = int(os.environ.get("DECOMPOSE_STEPS", "1941"))


def build_data(rng):
    n = BS * STEPS
    return {
        "pairs_u": jnp.asarray(rng.integers(1, U, n, dtype=np.int32)),
        "pairs_i": jnp.asarray(rng.integers(1, I, n, dtype=np.int32)),
        "hist": jnp.asarray(rng.integers(1, I, (U, 64), dtype=np.int32)),
    }


def make_epoch(model, optimizer, sampler: str, manual: bool = False):
    def step_neg(kn, hist_rows):
        if sampler == "fixed":
            return jax.random.randint(kn, (BS,), 1, I, dtype=jnp.int32)
        return uniform_negatives(kn, hist_rows, I)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        k_perm, k_steps = jax.random.split(key)
        batches = sample_pair_epoch(k_perm, data["pairs_u"].shape[0], BS,
                                    STEPS)
        keys = jax.random.split(k_steps, STEPS)

        def step(c, xs):
            prm, opt = c
            idx, kk = xs
            kn, kl = jax.random.split(kk)
            u = data["pairs_u"][idx]
            pos = data["pairs_i"][idx]
            neg = step_neg(kn, data["hist"][u])
            if manual:
                grads, aux = model.manual_grads(prm, (u, pos, neg), kl)
            else:
                (_, aux), grads = jax.value_and_grad(
                    model.loss, has_aux=True)(prm, (u, pos, neg), kl)
            updates, opt = optimizer.update(grads, opt, prm)
            prm = optax.apply_updates(prm, updates)
            return (prm, opt), aux

        (params, opt_state), auxes = jax.lax.scan(
            step, (params, opt_state), (batches, keys))
        return (params, opt_state), jax.tree.map(jnp.mean, auxes)

    return epoch_fn


def make_noop_epoch():
    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        k_perm, k_steps = jax.random.split(key)
        batches = sample_pair_epoch(k_perm, data["pairs_u"].shape[0], BS,
                                    STEPS)
        keys = jax.random.split(k_steps, STEPS)

        def step(c, xs):
            prm, opt = c
            idx, kk = xs
            u = data["pairs_u"][idx]
            pos = data["pairs_i"][idx]
            s = jnp.sum(prm["P"][u] * prm["Q"][pos])
            return (prm, opt), {"loss": s}

        (params, opt_state), auxes = jax.lax.scan(
            step, (params, opt_state), (batches, keys))
        return (params, opt_state), jax.tree.map(jnp.mean, auxes)

    return epoch_fn


def time_epoch(epoch_fn, model, optimizer, data):
    params = model.init_params(jax.random.PRNGKey(0))
    carry = (params, optimizer.init(params))
    carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(1))
    float(aux["loss"])
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(2 + t))
        float(aux["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    rng = np.random.default_rng(0)
    data = build_data(rng)
    adagrad = optax.adagrad(0.05, initial_accumulator_value=0.1)
    apr = MFBPR(U, I, D, adversarial=True, eps=0.5, reg_adv=1.0)
    bpr = MFBPR(U, I, D)

    variants = [
        ("full", make_epoch(apr, adagrad, "reject"), apr, adagrad),
        ("full-manual", make_epoch(apr, adagrad, "reject", manual=True),
         apr, adagrad),
        ("clean", make_epoch(bpr, adagrad, "reject"), bpr, adagrad),
        ("fixed-neg", make_epoch(apr, adagrad, "fixed"), apr, adagrad),
        ("sgd", make_epoch(apr, optax.sgd(0.05), "reject"), apr,
         optax.sgd(0.05)),
        ("noop", make_noop_epoch(), bpr, adagrad),
    ]
    for name, fn, model, opt in variants:
        us = time_epoch(fn, model, opt, data) * 1e6
        print(json.dumps({"variant": name, "us_per_step": round(us, 1),
                          "ex_per_s": round(BS / us * 1e6)}), flush=True)


if __name__ == "__main__":
    main()
