"""Multi-seed evaluation harness (SURVEY.md §7.3): parity with the
reference is statistical, so quality claims should come with run-to-run
spread.

Usage:
    python scripts/multiseed.py --model bpr --seeds 2019,2020,2021 \
        --epochs 400 --data video --path /root/reference/data
"""

import argparse
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import numpy as np  # noqa: E402


def main():
    from acf_tpu.cli.main import main as cli_main

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bpr")
    ap.add_argument("--seeds", default="2019,2020,2021")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--verbose", type=int, default=25)
    ap.add_argument("--data", default="video")
    ap.add_argument("--path", default="/root/reference/data")
    ap.add_argument("--opath", default="out/multiseed/")
    # anything after the known flags is forwarded to the CLI verbatim
    # (e.g. `--maxlen 8` for the Video-parity SASRec geometry)
    args, extra = ap.parse_known_args()

    hrs, ndcgs, epochs = [], [], []
    for seed in args.seeds.split(","):
        best = cli_main([
            "--model", args.model, "--data", args.data, "--path", args.path,
            "--epochs", str(args.epochs),
            "--adv_epoch", str(args.epochs // 2),
            "--verbose", str(args.verbose), "--seed", seed,
            "--opath", args.opath] + extra)
        hrs.append(best.get("hr", float("nan")))
        ndcgs.append(best.get("ndcg", float("nan")))
        epochs.append(best.get("epoch", -1))
        print(json.dumps({"seed": int(seed), "hr10": hrs[-1],
                          "ndcg10": ndcgs[-1],
                          "best_epoch": epochs[-1]}), flush=True)
    summary = {
        "model": args.model, "n_seeds": len(hrs),
        "seeds": [int(s) for s in args.seeds.split(",")],
        "hr10": hrs, "ndcg10": ndcgs, "best_epochs": epochs,
        "hr10_mean": float(np.mean(hrs)), "hr10_std": float(np.std(hrs)),
        "hr10_min": float(np.min(hrs)),
        "ndcg10_mean": float(np.mean(ndcgs)),
        "ndcg10_std": float(np.std(ndcgs)),
        "ndcg10_min": float(np.min(ndcgs)),
    }
    print(json.dumps(summary))
    os.makedirs(args.opath, exist_ok=True)
    with open(os.path.join(args.opath,
                           f"multiseed_{args.model}.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
