"""Same-session A/B: remat (jax.checkpoint) on APL's generator sampling
chain vs the stock program.

Profile finding (out/r4/apl_profile.jsonl): the generator step costs ~3x
the critic step, dominated by HBM traffic on the [512, 23744] f32
residuals the autodiff saves across the sample chain (logits -> softmax ->
p_aux mix -> gumbel-softmax). Rematerializing that chain in the backward
pass re-pays one cheap [B,d]x[d,I] matmul (~40 us of MXU) to skip ~150 us
of residual save/load per step. This measures both programs back-to-back
in one process at full Video shape.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from acf_tpu.models.apl import APL  # noqa: E402

U, I = 31_013, 23_744
BS, STEPS = 512, 1941


def build(remat):
    model = APL(U, I, 64)
    model.remat_gen = remat
    return model.make_epoch_fn(optax.sgd(0.05), BS, STEPS)


def main():
    rng = np.random.default_rng(0)
    data = {
        "pairs_u": jnp.asarray(rng.integers(1, U, 470_000, dtype=np.int32)),
        "pairs_i": jnp.asarray(rng.integers(1, I, 470_000, dtype=np.int32)),
        "hist": jnp.asarray(rng.integers(0, I, (U, 10), dtype=np.int32)),
    }
    model = APL(U, I, 64)
    params = model.init_params(jax.random.PRNGKey(0))
    out = {}
    fns = {"stock": build(False), "remat": build(True)}
    carries = {}
    for name, fn in fns.items():
        p = jax.tree.map(jnp.copy, params)
        carries[name] = (p, model.init_opt_state(None, p))
        carries[name], stats = fn(carries[name], data, jax.random.PRNGKey(1))
        float(stats["loss"])  # compile + warmup
    for _ in range(2):  # interleaved
        for name, fn in fns.items():
            t0 = time.time()
            for k in range(3):
                carries[name], stats = fn(carries[name], data,
                                          jax.random.PRNGKey(2 + k))
            float(stats["loss"])
            out.setdefault(name, []).append(round((time.time() - t0) / 3, 3))
    print(json.dumps({"epoch_s": out,
                      "speedup": round(min(out["stock"])
                                       / min(out["remat"]), 3)}))


if __name__ == "__main__":
    main()
