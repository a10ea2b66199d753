"""Decompose the per-eval-block wall time of a Video-scale SASRec parity
run: run_epochs(20) vs evaluate() vs the extras (norms, key staging).

Prints one JSON line per probe (3-trial best).
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import optax  # noqa: E402

from acf_tpu.data import load_dataset  # noqa: E402
from acf_tpu.models.sasrec import SASRec  # noqa: E402
from acf_tpu.train import Trainer, TrainConfig  # noqa: E402


def best3(fn):
    out = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        out = min(out, time.perf_counter() - t0)
    return out


def main():
    data = load_dataset("video", "/root/reference/data")
    model = SASRec(data.num_users, data.num_items, 64, maxlen=8)
    tr = Trainer(model, data, optax.adam(0.001, b2=0.98),
                 TrainConfig(batch_size=512, verbose=20))
    # warm everything
    tr.run_epoch()
    tr.run_epochs(20)
    tr.evaluate()
    tr._table_norms()

    probes = {
        "run_epoch_x1": lambda: tr.run_epoch(),
        "run_epochs_20": lambda: tr.run_epochs(20),
        "evaluate": lambda: tr.evaluate(),
        "table_norms": lambda: tr._table_norms(),
    }
    for name, fn in probes.items():
        print(json.dumps({"probe": name, "best_s": round(best3(fn), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
