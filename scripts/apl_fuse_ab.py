"""Same-session A/B: APL capped-fusion (5-epoch blocks) vs per-epoch
dispatch. Cross-day wall clocks are not comparable (tunnel latency drifts
~10x between rounds — docs/PARITY.md bench guard), so measure both paths
back-to-back in ONE process and report per-epoch seconds for each.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import optax  # noqa: E402

from acf_tpu.data import load_dataset  # noqa: E402
from acf_tpu.models import APL  # noqa: E402
from acf_tpu.train import TrainConfig, Trainer  # noqa: E402


def timed_epochs(tr, mode, n=20):
    t0 = time.time()
    if mode == "capped":
        for _ in range(n // 5):
            tr.run_epochs(5)
    else:
        for _ in range(n):
            tr.run_epoch()
    # fresh (non-donated) output forces a true sync (CLAUDE.md gotcha)
    float(tr.params["g"]["P"][0, 0])
    return (time.time() - t0) / n


def main():
    data = load_dataset("video", "/root/reference/data")
    model = APL(data.num_users, data.num_items, 64)
    tr = Trainer(model, data, optax.sgd(0.05),
                 TrainConfig(batch_size=512, verbose=10 ** 9))
    tr.run_epoch()    # compile single-epoch program
    tr.run_epochs(5)  # compile the capped block
    out = {}
    for mode in ("per_epoch", "capped", "per_epoch", "capped"):
        s = timed_epochs(tr, mode)
        out.setdefault(mode, []).append(round(s, 3))
    print(json.dumps({"per_epoch_s": out["per_epoch"],
                      "capped_s": out["capped"],
                      "speedup": round(min(out["per_epoch"])
                                       / min(out["capped"]), 3)}))


if __name__ == "__main__":
    main()
