"""Quality-parity runs on the Video dataset vs BASELINE.md.

Reference rows (eval_mode=all, d=64, best epoch by NDCG):
  BPR     HR@10 0.0621  NDCG@10 0.0318  (best epoch 1140 / 2000)
  APR     HR@10 0.0650  NDCG@10 0.0331  (best epoch 1360)
  SASRec  HR@10 0.0802  NDCG@10 0.0405  (best epoch 1760, maxlen 8)
  ASASRec HR@10 0.0993  NDCG@10 0.0516  (best epoch 1320, maxlen 8)

Usage: python scripts/parity_video.py [--epochs N] [--models bpr,apr,...]
Writes reference-format logs to out/parity/ and a summary JSON.
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
from acf_tpu.models import MFBPR, SASRec  # noqa: E402
from acf_tpu.train import TrainConfig, Trainer  # noqa: E402
from acf_tpu.train.trainer import fit_two_phase  # noqa: E402
from acf_tpu.utils.io import OutputWriter  # noqa: E402


def run(name, data, args):
    def _mk_sasrec(**kw):
        m = SASRec(data.num_users, data.num_items, 64, maxlen=8, **kw)
        if args.legacy:
            # pre-round-2 trainer path: generic 3-gather loss via the
            # expansion fallback (window slices carry the same values);
            # per-INSTANCE switch (make_seq_epoch_fn honors it) — no
            # global class mutation
            m.use_window_loss = False
        return m
    cfg = TrainConfig(batch_size=512, epochs=args.epochs,
                      verbose=args.verbose, topk=10, seed=args.seed)
    writer = OutputWriter(args.out, f"video_{name}")
    adagrad = optax.adagrad(0.05, initial_accumulator_value=0.1)
    adam = optax.adam(0.001, b2=0.98)
    U, I = data.num_users, data.num_items
    t0 = time.time()
    if name == "bpr":
        best = Trainer(MFBPR(U, I, 64), data, adagrad, cfg, writer).fit()
    elif name == "apr":
        clean = MFBPR(U, I, 64)
        adv = MFBPR(U, I, 64, adversarial=True, eps=0.5, reg_adv=1.0)
        best = fit_two_phase(clean, adv, data, adagrad, cfg,
                             adv_epoch=args.epochs // 2, writer=writer)
    elif name == "sasrec":
        best = Trainer(_mk_sasrec(), data, adam, cfg, writer).fit()
    elif name == "asasrec":
        clean = _mk_sasrec()
        adv = _mk_sasrec(adversarial=True, eps=0.5, reg_adv=1.0)
        # asasrec carries Adam slots into phase 2 (reference full-var Saver,
        # utils.py:306-315) — unlike apr, which resets Adagrad accumulators
        best = fit_two_phase(clean, adv, data, adam, cfg,
                             adv_epoch=args.epochs // 2, writer=writer,
                             reset_opt=False)
    else:
        raise ValueError(name)
    return {"model": name, "hr10": best.get("hr"), "ndcg10": best.get("ndcg"),
            "best_epoch": best.get("epoch"), "wall_s": round(time.time() - t0, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2000)
    p.add_argument("--verbose", type=int, default=20)
    p.add_argument("--models", type=str, default="bpr,apr,sasrec,asasrec")
    p.add_argument("--out", type=str, default="out/parity/")
    p.add_argument("--seed", type=int, default=2019)
    p.add_argument("--legacy", action="store_true",
                   help="train through the pre-window 3-gather loss path")
    p.add_argument("--data_dir", type=str, default="/root/reference/data")
    args = p.parse_args()

    data = load_dataset("video", args.data_dir)
    results = []
    for name in args.models.split(","):
        print(f"=== {name} ===", flush=True)
        r = run(name, data, args)
        print(json.dumps(r), flush=True)
        results.append(r)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
