"""Scaling-efficiency harness: examples/s for the adversarial BPR step
across mesh sizes.

On a real pod slice this measures the 1-chip → N-chip scaling efficiency
(BASELINE.md target: ≥80%). On a single chip / CPU it validates the harness
with virtual devices (set XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu for an N-device dry run; virtual-device timings are not
efficiency claims).

Measures both parallelization styles:
  * pjit/GSPMD: batch sharded over "data", tables row-sharded over "model"
  * explicit shard_map collectives (parallel/sharded_embedding.py)

Usage: python scripts/scaling_bench.py [--users 200000] [--items 500000]
       [--dim 64] [--batch 4096] [--steps 50]
Prints one JSON line per (style, mesh) configuration.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def bench_pjit(mesh, args):
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.parallel.mesh import shard_batch, shard_params

    model = MFBPR(args.users, args.items, args.dim, adversarial=True)
    params = shard_params(mesh, model.init_params(jax.random.PRNGKey(0)),
                          min_rows=mesh.shape["model"])
    optimizer = optax.adagrad(0.05)
    opt_state = jax.device_put(optimizer.init(params))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, (
        jnp.asarray(rng.integers(1, args.users, args.batch, dtype=np.int32)),
        jnp.asarray(rng.integers(1, args.items, args.batch, dtype=np.int32)),
        jnp.asarray(rng.integers(1, args.items, args.batch, dtype=np.int32)),
    ))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, batch, key):
        (_, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux["loss"]

    with mesh:
        params, opt_state, loss = step(params, opt_state, batch, key)
        jax.block_until_ready(loss)
        t0 = time.time()
        for _ in range(args.steps):
            params, opt_state, loss = step(params, opt_state, batch, key)
        jax.block_until_ready(loss)
    dt = time.time() - t0
    return args.steps * args.batch / dt


def bench_shard_map(mesh, args):
    from acf_tpu.parallel.sharded_embedding import (
        make_sharded_bpr_step, shard_table,
    )

    rng = np.random.default_rng(0)
    P = shard_table(mesh, 0.01 * jnp.asarray(
        rng.standard_normal((args.users, args.dim)).astype(np.float32)))
    Q = shard_table(mesh, 0.01 * jnp.asarray(
        rng.standard_normal((args.items, args.dim)).astype(np.float32)))
    u = jnp.asarray(rng.integers(1, args.users, args.batch, dtype=np.int32))
    p = jnp.asarray(rng.integers(1, args.items, args.batch, dtype=np.int32))
    n = jnp.asarray(rng.integers(1, args.items, args.batch, dtype=np.int32))
    step = make_sharded_bpr_step(mesh, eps=0.5, reg_adv=1.0)
    with mesh:
        P, Q = step(P, Q, u, p, n)
        jax.block_until_ready(P)
        t0 = time.time()
        for _ in range(args.steps):
            P, Q = step(P, Q, u, p, n)
        jax.block_until_ready(P)
    dt = time.time() - t0
    return args.steps * args.batch / dt


def main():
    from acf_tpu.parallel.mesh import make_mesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    base = {}
    for style, fn in (("pjit", bench_pjit), ("shard_map", bench_shard_map)):
        for s in sizes:
            num_model = 2 if s % 2 == 0 else 1
            mesh = make_mesh(num_data=s // num_model, num_model=num_model,
                             devices=jax.devices()[:s])
            ex_s = fn(mesh, args)
            if s == 1:
                base[style] = ex_s
            print(json.dumps({
                "style": style, "devices": s,
                "examples_per_sec": round(ex_s),
                "scaling_efficiency": round(ex_s / (base[style] * s), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
