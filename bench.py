"""Benchmark: APR adversarial training throughput on the Video dataset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's APR epoch on single-core CPU — ~994k pairs in
~3.7 s train time on ml-1m (BASELINE.md "ml-1m APR" row) ≈ 268k examples/s,
with its ~13.9 s/epoch batch generation excluded to be maximally generous to
the reference. Here sampling + FGSM + optimizer update all run on device and
are *included* in the measured time.
"""

import json
import os
import time

import jax

# persistent compile cache: the driver re-runs this every round
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import optax  # noqa: E402


def main():
    from acf_tpu.data import load_dataset
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.train.trainer import Trainer, TrainConfig

    data = load_dataset("video", "/root/reference/data")
    model = MFBPR(data.num_users, data.num_items, 64, adversarial=True,
                  eps=0.5, reg_adv=1.0)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)
    cfg = TrainConfig(batch_size=512)
    tr = Trainer(model, data, opt, cfg)

    tr.run_epoch()  # compile + warmup
    n_epochs = 5
    t0 = time.time()
    for _ in range(n_epochs):
        tr.run_epoch()
    dt = time.time() - t0
    examples = n_epochs * tr.num_batches * cfg.batch_size
    ex_per_s = examples / dt

    baseline_cpu = 268_000.0  # reference APR train-phase examples/s (CPU)
    print(json.dumps({
        "metric": "apr_adversarial_train_examples_per_sec_per_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / baseline_cpu, 2),
    }))


if __name__ == "__main__":
    main()
