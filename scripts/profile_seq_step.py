"""Op-level TPU profile of the SASRec train step (clean, XLA path).

Captures a jax.profiler trace of a short scanned epoch at the requested
geometry and aggregates XLA-op durations from the xplane proto by op
category — localizes where a kernel-count-bound step actually spends time
(attention backward, gathers/scatters, optimizer, RNG, transposes, ...).

Env: PROFILE_MAXLEN (default 50), PROFILE_BS (512), PROFILE_STEPS (100),
PROFILE_MODE (train|fwd), PROFILE_DTYPE (bfloat16|float32).
Prints the top-N ops and a category rollup as JSON lines.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
from collections import defaultdict
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from acf_tpu.models.sasrec import SASRec  # noqa: E402
from acf_tpu.sampling.negatives import sample_seq_batch  # noqa: E402

U, I, D = 31_013, 23_745, 64
BS = int(os.environ.get("PROFILE_BS", "512"))
MAXLEN = int(os.environ.get("PROFILE_MAXLEN", "50"))
STEPS = int(os.environ.get("PROFILE_STEPS", "100"))
MODE = os.environ.get("PROFILE_MODE", "train")
DTYPE = os.environ.get("PROFILE_DTYPE", "bfloat16")
HIST_L = max(64, MAXLEN)


def build_data(rng):
    hist = rng.integers(1, I, (U, HIST_L), dtype=np.int32)
    lens = rng.integers(2, HIST_L, U)
    mask = np.arange(HIST_L)[None, :] < (HIST_L - lens[:, None])
    hist[mask] = 0
    return {"hist": jnp.asarray(hist),
            "eligible": jnp.asarray(np.arange(U, dtype=np.int32))}


def make_epoch(model, optimizer):
    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        step_keys = jax.random.split(key, STEPS)

        def step(c, kk):
            prm, opt = c
            ks, kl = jax.random.split(kk)
            users, seq, pos, neg = sample_seq_batch(
                ks, data["hist"], data["eligible"], MAXLEN, I, BS)
            if MODE == "fwd":
                l, _ = model.loss(prm, (users, seq, pos, neg), kl)
                return (prm, opt), {"loss": l}
            (_, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
                prm, (users, seq, pos, neg), kl)
            updates, opt = optimizer.update(grads, opt, prm)
            prm = optax.apply_updates(prm, updates)
            return (prm, opt), {"loss": aux["loss"]}

        (params, opt_state), auxes = jax.lax.scan(
            step, (params, opt_state), step_keys)
        return (params, opt_state), jax.tree.map(jnp.mean, auxes)

    return epoch_fn


_CATEGORIES = [
    ("rng", re.compile(r"rng|threefry|bitcast-convert|iota", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-slice|dynamic-update-slice", re.I)),
    ("matmul", re.compile(r"dot|convolution", re.I)),
    ("transpose/copy", re.compile(r"transpose|copy|reshape|bitcast", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("elementwise-fusion", re.compile(r"fusion|add|multiply|subtract|divide|exponential|tanh|maximum|select|compare|convert|broadcast", re.I)),
]


def categorize(name: str) -> str:
    for cat, rx in _CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def parse_xplane(path):
    """Aggregate XLA-op event durations from an xplane.pb capture."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)
    per_op = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Op" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                per_op[name] += ev.duration_ps / 1e6  # ps -> us
    return per_op


def main():
    rng = np.random.default_rng(0)
    data = build_data(rng)
    model = SASRec(U, I, D, maxlen=MAXLEN, train_dtype=DTYPE)
    optimizer = optax.adam(0.001, b2=0.98)
    epoch_fn = make_epoch(model, optimizer)
    params = model.init_params(jax.random.PRNGKey(0))
    carry = (params, optimizer.init(params))
    carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(1))
    float(aux["loss"])  # warm/compile

    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/seq_step_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(2))
        float(aux["loss"])

    captures = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb*"), recursive=True))
    assert captures, f"no xplane capture under {trace_dir}"
    per_op = parse_xplane(captures[-1])
    total = sum(per_op.values())
    print(json.dumps({"geometry": {"B": BS, "T": MAXLEN, "d": D,
                                   "steps": STEPS, "mode": MODE,
                                   "dtype": DTYPE},
                      "total_device_us": round(total, 1),
                      "us_per_step": round(total / STEPS, 1)}))
    cats = defaultdict(float)
    for name, us in per_op.items():
        cats[categorize(name)] += us
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"category": cat, "us_per_step": round(us / STEPS, 1),
                          "pct": round(100 * us / total, 1)}))
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(json.dumps({"op": name[:110], "us_per_step": round(us / STEPS, 2),
                          "pct": round(100 * us / total, 1)}))


if __name__ == "__main__":
    main()
