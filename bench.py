"""Benchmark: APR adversarial training throughput (ml-1m-shaped workload)
plus the rest of the flagship surface (VERDICT r4 #4).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline APR metric, with an "extra_metrics" dict guarding the other three
headline numbers — ASASRec train throughput at the Video maxlen-8 protocol
shape, the full-catalog 31k x 23.7k evaluator, and bulk top-10 serving —
each best-of-3 with the per-sample spread recorded (the axon tunnel adds
run-to-run jitter; docs/PARITY.md "Bench guard" documents the expected
bands). "context_r4" fields are round-4 reference points for orientation
ONLY — per the bench guard, cross-day wall clocks are NOT comparable
(dispatch latency drifts ~10x between rounds); regression verdicts
require same-session interleaved A/B. A regression anywhere in the headline story now shows in
BENCH_r*.json, not only in ad-hoc scripts.

Baseline (vs_baseline): the reference's APR epoch on single-core CPU — ~994k pairs in
~3.7 s train time on ml-1m (BASELINE.md "ml-1m APR" row) ≈ 268k examples/s,
with its ~13.9 s/epoch batch generation excluded to be maximally generous to
the reference. Here sampling + FGSM + optimizer update all run on device and
are *included* in the measured time, on a synthetic dataset with ml-1m's
exact shape (throughput is shape-determined; ml-1m's raw data is not
fetchable in this environment — quality parity is measured on Video, see
docs/PARITY.md). Sub-metric context points ("context_r4") are round-4's
measured values on this same harness: ASASRec 787k ex/s, eval 0.28 s,
serving 28.7k users/s.
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


def bench_apr():
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
    examples = n_epochs * tr.num_batches * cfg.batch_size
    return examples / min(times), [round(examples / t, 1) for t in times]


def bench_flagship_extras():
    """The rest of the headline surface on the REAL Video dataset:
    adversarial SASRec training at the maxlen-8 parity protocol shape, the
    single-dispatch full-catalog evaluator, and bulk top-10 serving."""
    import numpy as np

    from acf_tpu.data import load_dataset
    from acf_tpu.eval.full_rank import FullRankEvaluator
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.models.sasrec import SASRec
    from acf_tpu.ops.topk import recommend
    from acf_tpu.train.trainer import Trainer, TrainConfig

    data = load_dataset("video", "/root/reference/data", max_hist_len=512)
    extras = {}

    # -- ASASRec train ex/s (maxlen-8 protocol geometry, bs 512) ---------
    sas = SASRec(data.num_users, data.num_items, 64, maxlen=8,
                 adversarial=True, eps=0.5, reg_adv=1.0)
    tr = Trainer(sas, data, optax.adam(0.001),
                 TrainConfig(batch_size=512, verbose=10 ** 9))
    tr.run_epoch()
    # 10-epoch blocks: a maxlen-8 seq epoch is only ~60 steps, so smaller
    # blocks are dominated by the ~30 ms axon dispatch round-trip (the
    # first widened-bench run measured 494k ex/s on 2-epoch blocks purely
    # from that fixed cost). context_r4 787k is the step-only
    # seq_step_decompose figure — epoch-level throughput includes
    # sampling + scan overheads and sits naturally below it.
    tr.run_epochs(10)
    times = [_timed(lambda: tr.run_epochs(10)) for _ in range(3)]
    ex = 10 * tr.num_batches * 512
    extras["asasrec_train_examples_per_sec"] = {
        "value": round(ex / min(times), 1),
        "samples": [round(ex / t, 1) for t in times], "context_r4": 787_000}

    # -- full-catalog eval seconds (31k users x 23.7k items) -------------
    mf = MFBPR(data.num_users, data.num_items, 64)
    params = mf.init_params(jax.random.PRNGKey(0))
    ev = FullRankEvaluator(data, batch_users=512)
    ev.evaluate_model(mf, params)  # compile + warm
    times = [_timed(lambda: ev.evaluate_model(mf, params))
             for _ in range(3)]
    extras["full_catalog_eval_seconds"] = {
        "value": round(min(times), 3),
        "samples": [round(t, 3) for t in times], "context_r4": 0.28}

    # -- bulk serving users/s (top-10 over the whole user base) ----------
    users = np.arange(1, data.num_users, dtype=np.int32)
    recommend(mf, params, data, users, k=10, batch_users=512)  # warm
    times = [_timed(lambda: recommend(mf, params, data, users, k=10,
                                      batch_users=512)) for _ in range(3)]
    extras["bulk_serve_users_per_sec"] = {
        "value": round(len(users) / min(times)),
        "samples": [round(len(users) / t) for t in times],
        "context_r4": 28_700}
    return extras


def main():
    ex_per_s, spread = bench_apr()
    extras = bench_flagship_extras()

    baseline_cpu = 268_000.0  # reference APR train-phase examples/s (CPU)
    print(json.dumps({
        "metric": "apr_adversarial_train_examples_per_sec_per_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / baseline_cpu, 2),
        "samples": spread,
        "extra_metrics": extras,
    }))


if __name__ == "__main__":
    main()
