"""Same-session A/B: APL closed-form generator backward (gen_step_manual)
vs the autodiff formulation, at full Video scale (1941 steps/epoch).

Cross-day wall clocks are not comparable through the axon tunnel
(docs/PARITY.md bench guard), so both variants run interleaved in ONE
process. ``--probe N`` instead runs a single N-epoch fused block with the
manual program in THIS process (a crash takes the worker down, so the
caller should give the probe its own process) — testing whether the
closed-form backward dodges the axon gen-phase crash that capped fusion
at 5-epoch blocks (docs/ROADMAP.md "APL fused-scan TPU worker crash").
"""

import argparse
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


def timed_epochs(tr, n):
    t0 = time.time()
    for _ in range(n):
        tr.run_epoch()
    # fresh (non-donated) output forces a true sync (CLAUDE.md gotcha)
    float(tr.params["g"]["P"][0, 0])
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10,
                    help="epochs per A/B leg")
    ap.add_argument("--probe", type=int, default=0,
                    help="run ONE fused block of this many epochs with the "
                         "manual program instead of the A/B (own process!)")
    args = ap.parse_args()

    data = load_dataset("video", "/root/reference/data")

    if args.probe:
        model = APL(data.num_users, data.num_items, 64, manual_gen=True)
        model.max_fuse_epochs = args.probe  # lift the cap for the probe
        tr = Trainer(model, data, optax.sgd(0.05),
                     TrainConfig(batch_size=512, verbose=10 ** 9))
        t0 = time.time()
        tr.run_epochs(args.probe)
        float(tr.params["g"]["P"][0, 0])
        print(json.dumps({"probe_epochs": args.probe, "ok": True,
                          "wall_s": round(time.time() - t0, 1)}))
        return

    trs = {}
    variants = (("manual", dict(manual_gen=True)),
                ("autodiff", dict(manual_gen=False)),
                ("fused", dict(fused_gen=True)))
    for name, kw in variants:
        model = APL(data.num_users, data.num_items, 64, **kw)
        trs[name] = Trainer(model, data, optax.sgd(0.05),
                            TrainConfig(batch_size=512, verbose=10 ** 9,
                                        seed=2019))
        trs[name].run_epoch()  # compile

    out = {}
    for name in ("manual", "autodiff", "fused", "manual", "autodiff",
                 "fused"):
        out.setdefault(name, []).append(
            round(timed_epochs(trs[name], args.epochs), 3))
    print(json.dumps({
        **{f"{k}_s_per_epoch": v for k, v in out.items()},
        "fused_vs_autodiff_x": round(min(out["autodiff"])
                                     / min(out["fused"]), 3),
        "manual_vs_autodiff_x": round(min(out["autodiff"])
                                      / min(out["manual"]), 3),
        "steps_per_epoch": trs["manual"].num_batches,
    }))


if __name__ == "__main__":
    main()
