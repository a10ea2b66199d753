"""DSIN capacity-control sweep on Video (round-4 follow-up to the first
at-scale DSIN run, which overfit: best epoch 0, train ACC -> 1.0 by epoch 50,
HR@10 halving thereafter). Sweeps (dropout, l2_emb) at the protocol geometry
(2 sessions x 4 items = the maxlen-8 window) to find a configuration that
holds its ranking quality while training.
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
from acf_tpu.models.dsin import DSIN  # noqa: E402
from acf_tpu.train import TrainConfig, Trainer  # noqa: E402
from acf_tpu.utils.io import OutputWriter  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    # DSIN peaks early (< epoch 50 in every bce config): evaluate every 5
    # epochs so the best-epoch search actually sees the peak, and stop at
    # 200 (no config has improved past ~50)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--verbose", type=int, default=5)
    ap.add_argument("--out", type=str, default="out/r4_dsin_sweep/")
    ap.add_argument("--configs", type=str,
                    default="0.3:1e-4,0.5:1e-4,0.3:0,0:1e-4,0.5:1e-3")
    args = ap.parse_args()

    data = load_dataset("video", "/root/reference/data")
    results = []
    for spec in args.configs.split(","):
        parts = spec.split(":")
        dr, l2 = float(parts[0]), float(parts[1])
        lt = parts[2] if len(parts) > 2 else "bce"
        lr = float(parts[3]) if len(parts) > 3 else 0.001
        bi = len(parts) > 4 and parts[4] == "bi"  # round-5 Bi-GRU evolution
        name = f"dsin_d{dr}_l2{l2}_{lt}_lr{lr}" + ("_bi" if bi else "")
        print(f"=== {name} ===", flush=True)
        model = DSIN(data.num_users, data.num_items, 64,
                     sess_count=2, sess_len=4, dropout=dr, l2_emb=l2,
                     loss_type=lt, bi_evolution=bi)
        cfg = TrainConfig(batch_size=512, epochs=args.epochs,
                          verbose=args.verbose)
        t0 = time.time()
        tr = Trainer(model, data, optax.adam(lr), cfg,
                     OutputWriter(args.out, f"video_{name}"))
        best = tr.fit()
        r = {"config": spec, "hr10": best.get("hr"),
             "ndcg10": best.get("ndcg"), "best_epoch": best.get("epoch"),
             "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(r), flush=True)
        results.append(r)
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
