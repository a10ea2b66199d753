"""On-TPU microbenchmark: sparse row-space step dedup programs vs dense step.

Times one scan-epoch (fixed step count) of:
  * SparseMFBPR(dedup="sort")   — jnp.unique + scatter-add aggregation
  * SparseMFBPR(dedup="matmul") — sort-free equality-matrix MXU aggregation
  * dense MFBPR + optax.adagrad — full-table optimizer passes per step

at reference scale (ml-1m-shaped) and at a production-scale catalog where
the sparse step's O(B·d) HBM traffic should beat the dense step's
O(|U|·d + |I|·d). Prints one JSON line per config.

Usage: python scripts/dedup_bench.py [--steps 200] [--bs 4096]
"""

from __future__ import annotations

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


def build_data(rng, num_users, num_items, n_pairs, hist_cols=4):
    return {
        "pairs_u": jnp.asarray(
            rng.integers(1, num_users, n_pairs, dtype=np.int32)),
        "pairs_i": jnp.asarray(
            rng.integers(1, num_items, n_pairs, dtype=np.int32)),
        "hist": jnp.asarray(
            rng.integers(1, num_items, (num_users, hist_cols),
                         dtype=np.int32)),
    }


def time_epoch(model, optimizer, data, bs, steps, seed=0, mesh=None):
    params = model.init_params(jax.random.PRNGKey(seed))
    if mesh is not None:
        from acf_tpu.parallel.input_pipeline import replicate
        data = {k: replicate(mesh, v) for k, v in data.items()}
    if hasattr(model, "init_opt_state"):
        opt_state = model.init_opt_state(optimizer, params)
        epoch_fn = model.make_epoch_fn(optimizer, bs, steps, mesh=mesh)
    else:
        from acf_tpu.train.trainer import make_pair_epoch_fn
        opt_state = optimizer.init(params)
        epoch_fn = make_pair_epoch_fn(model, optimizer, bs, steps,
                                      mesh=mesh)
    carry = (params, opt_state)
    key = jax.random.PRNGKey(1)
    carry, aux = epoch_fn(carry, data, key)        # compile + warm
    # Sync on the epoch STATS, not the carry: through the remote-TPU (axon)
    # runtime, block_until_ready on donation-aliased outputs can return
    # before the computation finishes (>1000x under-report). The stats are
    # fresh buffers depending on every scan step, so materializing them is
    # a true epoch barrier.
    float(aux["loss"])
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(2 + trial))
        float(aux["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--bs", type=int, default=4096)
    ap.add_argument("--mesh", type=str, default="",
                    help="run the sparse rows under a DATAxMODEL mesh too "
                         "(e.g. 1x2: tables + Adagrad slots row-sharded "
                         "2-way over \"model\"); falls back to virtual CPU "
                         "devices when the runtime has fewer real chips")
    args = ap.parse_args()

    from acf_tpu.models.mf import MFBPR
    from acf_tpu.ops.sparse_step import SparseMFBPR

    mesh = None
    if args.mesh:
        from acf_tpu.parallel.mesh import mesh_from_spec
        mesh = mesh_from_spec(args.mesh)

    scales = [
        # (name, users, items, run_dense) — dense autodiff materializes
        # full [I, d] gradient tables; at the 10M catalog that plus temps
        # exhausts one chip's HBM, which is the point of the sparse step.
        ("ml1m-scale", 6_041, 3_707, True),
        ("prod-1M", 200_001, 1_000_001, True),
        ("prod-10M", 1_000_001, 10_000_001, False),
    ]
    rng = np.random.default_rng(0)
    for name, U, I, run_dense in scales:
        data = build_data(rng, U, I, n_pairs=args.bs * args.steps)
        results = {}
        for mode in ("sort", "matmul"):
            m = SparseMFBPR(U, I, 64, adversarial=True, eps=0.5,
                            reg_adv=1.0, dedup=mode)
            results[mode] = time_epoch(m, None, data, args.bs, args.steps)
            if mesh is not None:
                results[f"{mode}-mesh"] = time_epoch(
                    m, None, data, args.bs, args.steps, mesh=mesh)
        if run_dense:
            dense = MFBPR(U, I, 64, adversarial=True, eps=0.5, reg_adv=1.0)
            results["dense"] = time_epoch(
                dense, optax.adagrad(0.05, initial_accumulator_value=0.1),
                data, args.bs, args.steps)
        line = {
            "scale": name, "users": U, "items": I, "bs": args.bs,
            **{f"{k}_us_per_step": round(v * 1e6, 1)
               for k, v in results.items()},
            "matmul_vs_sort_x": round(results["sort"] / results["matmul"], 2),
        }
        if run_dense:
            line["sparse_vs_dense_x"] = round(
                results["dense"] / results["matmul"], 2)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
