"""Measure today's per-dispatch round-trip cost through the axon tunnel.

Times N sequential synchronized calls of a trivial jitted program (donate
nothing, materialize the scalar result each call — a true host round-trip
per iteration) and prints the per-call cost. Used to interpret bench A/B
leg C: the r1 bench's
per-epoch-dispatch design pays this cost every epoch, the fused run_epochs
design pays it once per block.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import jax.numpy as jnp  # noqa: E402


def main():
    x = jnp.ones((8, 8))

    @jax.jit
    def tiny(x):
        return jnp.sum(x * 1.0001)

    float(tiny(x))  # compile + warmup
    n = 30
    t0 = time.time()
    for _ in range(n):
        v = float(tiny(x))
    per_tiny = (time.time() - t0) / n
    print(json.dumps({"tiny_dispatch_ms": round(per_tiny * 1e3, 2),
                      "n": n, "check": v}), flush=True)


if __name__ == "__main__":
    main()
