"""Staged-epsilon ASASRec: stabilize the eps=0.8 adversarial optimum.

Round-5 finding (docs/PARITY.md "Round-5 settlement"): at the maxlen-8
protocol, eps=0.8 lifts ASASRec to HR 0.100-0.104 (vs the reference's
0.0993) — but the adversarial-phase shock at epoch ``adv_epoch``
bifurcates: per seed the recovery lands either in the strong optimum
(~0.10) or a degenerate one (~0.065, seeds 2021/2023).

Hypothesis: entering the adversarial game at the reference's eps=0.5
first, THEN raising eps to 0.8 once the model sits inside the
adversarial basin, avoids the bifurcation while keeping the eps=0.8
end-point. Three stages sharing one Trainer (Adam slots carried across
switches, the asasrec full-variable-Saver semantics):

  clean 0..adv_epoch -> eps=0.5 adv_epoch..stage2 -> eps=0.8 stage2..end

Usage:
    python scripts/asasrec_eps_staged.py --seeds 2021,2023 \
        --adv_epoch 800 --stage2 1100 --epochs 2000
"""

import argparse
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import numpy as np  # noqa: E402
import optax  # noqa: E402

from acf_tpu.data import load_dataset  # noqa: E402
from acf_tpu.models.sasrec import SASRec  # noqa: E402
from acf_tpu.train import TrainConfig, Trainer  # noqa: E402
from acf_tpu.utils.io import OutputWriter  # noqa: E402


def run_seed(data, seed, args):
    U, I, d = data.num_users, data.num_items, 64
    kw = dict(maxlen=args.maxlen)
    clean = SASRec(U, I, d, **kw)
    adv_lo = SASRec(U, I, d, adversarial=True, eps=args.eps_lo,
                    reg_adv=args.reg_adv, **kw)
    adv_hi = SASRec(U, I, d, adversarial=True, eps=args.eps_hi,
                    reg_adv=args.reg_adv, **kw)
    cfg = TrainConfig(batch_size=512, epochs=args.epochs,
                      verbose=args.verbose, seed=seed)
    writer = OutputWriter(args.opath, f"staged_s{seed}")
    tr = Trainer(clean, data, optax.adam(0.001, b2=0.98), cfg, writer)
    tr.fit(epochs=args.adv_epoch, final=False)
    tr.switch_model(adv_lo, reset_opt=False)  # asasrec carries Adam slots
    tr.fit(epochs=args.stage2, epoch_start=args.adv_epoch, final=False)
    tr.switch_model(adv_hi, reset_opt=False)
    best = tr.fit(epochs=args.epochs, epoch_start=args.stage2)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="2021,2023")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--adv_epoch", type=int, default=800)
    ap.add_argument("--stage2", type=int, default=1100,
                    help="epoch at which eps rises to --eps_hi")
    ap.add_argument("--eps_lo", type=float, default=0.5)
    ap.add_argument("--eps_hi", type=float, default=0.8)
    ap.add_argument("--reg_adv", type=float, default=0.5)
    ap.add_argument("--maxlen", type=int, default=8)
    ap.add_argument("--verbose", type=int, default=20)
    ap.add_argument("--opath", default="out/r5_asasrec_staged/")
    args = ap.parse_args()

    data = load_dataset("video", "/root/reference/data")
    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        best = run_seed(data, seed, args)
        rows.append({"seed": seed, "hr10": best.get("hr"),
                     "ndcg10": best.get("ndcg"),
                     "best_epoch": best.get("epoch")})
        print(json.dumps(rows[-1]), flush=True)
    hrs = [r["hr10"] for r in rows]
    print(json.dumps({"config": vars(args) | {"seeds": args.seeds},
                      "hr10_mean": float(np.mean(hrs)),
                      "hr10_min": float(np.min(hrs)), "rows": rows}))


if __name__ == "__main__":
    main()
