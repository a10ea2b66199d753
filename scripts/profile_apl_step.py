"""Op-level TPU profile of the APL epoch (critic scan + generator scan).

APL is the slowest zoo member (~2.9 s/epoch at Video scale, round-4
capped-fusion run) — localize where the two full-catalog softmax/gumbel
phases actually spend device time before optimizing anything. Reuses the
xplane aggregation from profile_seq_step.py.

Env: PROFILE_STEPS (default 100 steps per phase), PROFILE_BS (512),
PROFILE_ITEMS (23744).
"""

import glob
import json
import os
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from profile_seq_step import categorize, parse_xplane  # noqa: E402

from acf_tpu.models.apl import APL  # noqa: E402

U = 31_013
BS = int(os.environ.get("PROFILE_BS", "512"))
ITEMS = int(os.environ.get("PROFILE_ITEMS", "23744"))
STEPS = int(os.environ.get("PROFILE_STEPS", "100"))


def main():
    rng = np.random.default_rng(0)
    data = {
        "pairs_u": jnp.asarray(rng.integers(1, U, 500_000, dtype=np.int32)),
        "pairs_i": jnp.asarray(rng.integers(1, ITEMS, 500_000,
                                            dtype=np.int32)),
        "hist": jnp.asarray(rng.integers(0, ITEMS, (U, 10), dtype=np.int32)),
    }
    model = APL(U, ITEMS, 64)
    epoch_fn = model.make_epoch_fn(optax.sgd(0.05), BS, STEPS)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = model.init_opt_state(None, params)
    carry = (params, opt_state)
    carry, stats = epoch_fn(carry, data, jax.random.PRNGKey(1))
    float(stats["loss"])  # compile + warmup

    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/apl_step_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        carry, stats = epoch_fn(carry, data, jax.random.PRNGKey(2))
        float(stats["loss"])

    captures = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb*"), recursive=True))
    assert captures, f"no xplane capture under {trace_dir}"
    per_op = parse_xplane(captures[-1])
    total = sum(per_op.values())
    # STEPS critic steps + STEPS generator steps per epoch program
    print(json.dumps({"geometry": {"B": BS, "I": ITEMS, "d": 64,
                                   "steps_per_phase": STEPS},
                      "total_device_us": round(total, 1),
                      "us_per_step_pair": round(total / STEPS, 1)}))
    cats = defaultdict(float)
    for name, us in per_op.items():
        cats[categorize(name)] += us
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"category": cat,
                          "us_per_step_pair": round(us / STEPS, 1),
                          "pct": round(100 * us / total, 1)}))
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(json.dumps({"op": name[:110],
                          "us_per_step_pair": round(us / STEPS, 2),
                          "pct": round(100 * us / total, 1)}))


if __name__ == "__main__":
    main()
