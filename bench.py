"""Benchmark: APR adversarial training throughput (ml-1m-shaped workload).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's APR epoch on single-core CPU — ~994k pairs in
~3.7 s train time on ml-1m (BASELINE.md "ml-1m APR" row) ≈ 268k examples/s,
with its ~13.9 s/epoch batch generation excluded to be maximally generous to
the reference. Here sampling + FGSM + optimizer update all run on device and
are *included* in the measured time, on a synthetic dataset with ml-1m's
exact shape (throughput is shape-determined; ml-1m's raw data is not
fetchable in this environment — quality parity is measured on Video, see
docs/PARITY.md).
"""

import json
import os
import time

import jax

# persistent compile cache: the driver re-runs this every round
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import optax  # noqa: E402


def make_ml1m_shaped():
    """Synthetic interactions with ml-1m's shape (6040 users, 3706 items,
    ~994k train pairs — BASELINE.md): throughput depends only on shapes, and
    the baseline figure is the reference's ml-1m APR train phase."""
    import numpy as np
    import pandas as pd

    from acf_tpu.data import interactions_from_frame

    rng = np.random.default_rng(0)
    n = 994_000
    df = pd.DataFrame({
        "uid": rng.integers(1, 6041, size=n),
        "iid": rng.integers(1, 3707, size=n),
        "timestamp": np.arange(n, dtype=np.int64),
    })
    return interactions_from_frame(df, reindex=False, max_hist_len=512)


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.train.trainer import Trainer, TrainConfig

    data = make_ml1m_shaped()
    model = MFBPR(data.num_users, data.num_items, 64, adversarial=True,
                  eps=0.5, reg_adv=1.0)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)
    cfg = TrainConfig(batch_size=512)
    tr = Trainer(model, data, opt, cfg)

    n_epochs = 5
    tr.run_epoch()          # compile single-epoch program + warmup
    tr.run_epochs(n_epochs)  # compile the fused block (the fit() hot path)
    # best-of-3 same-session blocks: the axon tunnel adds run-to-run jitter
    # (VERDICT r2 #6 — record the spread so round-over-round deltas are
    # interpretable against the measurement noise)
    times = [_timed(lambda: tr.run_epochs(n_epochs)) for _ in range(3)]
    dt = min(times)
    examples = n_epochs * tr.num_batches * cfg.batch_size
    ex_per_s = examples / dt
    spread = [round(examples / t, 1) for t in times]

    baseline_cpu = 268_000.0  # reference APR train-phase examples/s (CPU)
    print(json.dumps({
        "metric": "apr_adversarial_train_examples_per_sec_per_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / baseline_cpu, 2),
        "samples": spread,
    }))


if __name__ == "__main__":
    main()
