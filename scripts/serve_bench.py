"""Serving-path benchmark: full-catalog top-K recommendation QPS on TPU.

Times ``ops.topk.recommend`` (the production serving entry point: factored
scorer + tiled HIGHEST-precision top-K with train-item masking) at Video
scale for the two flagship families:
  mf      — MFBPR (dot-factored, the APR serving shape)
  sasrec  — SASRec (encoder forward per batch, then factored top-K)

Reports sustained throughput over the full user base (users/s) and median
per-batch latency. One JSON line per model. Params are freshly initialized
— serving cost does not depend on the values.

Usage: python scripts/serve_bench.py  [SERVE_BATCH=512] [SERVE_K=10]
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import numpy as np  # noqa: E402

from acf_tpu.data import load_dataset  # noqa: E402
from acf_tpu.models.mf import MFBPR  # noqa: E402
from acf_tpu.models.sasrec import SASRec  # noqa: E402
from acf_tpu.ops.topk import recommend  # noqa: E402

BATCH = int(os.environ.get("SERVE_BATCH", "512"))
K = int(os.environ.get("SERVE_K", "10"))


def bench(name, model, params, data, users):
    # warm-up compiles the full bulk program (one dispatch per request)
    recommend(model, params, data, users, k=K, batch_users=BATCH)
    reps, best = 3, float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sc, it = recommend(model, params, data, users, k=K,
                           batch_users=BATCH)
        best = min(best, time.perf_counter() - t0)
    assert it.shape == (len(users), K) and (it > 0).all()
    n_batches = -(-len(users) // BATCH)
    print(json.dumps({
        "model": name, "users": len(users), "catalog": int(data.num_items),
        "k": K, "batch": BATCH,
        "users_per_s": round(len(users) / best),
        "ms_per_batch": round(best / n_batches * 1e3, 2),
    }), flush=True)


def main():
    data = load_dataset("video", "/root/reference/data")
    users = np.arange(1, data.num_users, dtype=np.int32)
    key = jax.random.PRNGKey(0)

    mf = MFBPR(data.num_users, data.num_items, 64)
    bench("mf", mf, mf.init_params(key), data, users)

    maxlen = max(8, min(int((data.hist > 0).sum(1).mean()), 50))
    sas = SASRec(data.num_users, data.num_items, 64, maxlen=maxlen)
    bench("sasrec", sas, sas.init_params(key), data, users)


if __name__ == "__main__":
    main()
