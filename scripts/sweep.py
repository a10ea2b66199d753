"""Hyperparameter sweeps: the reference's SGE qsub grid (script.sh:13-44)
as sequential CLI invocations (each run is minutes here, not 72-hour jobs;
fan out across machines by splitting --grid if needed).

Usage:
    python scripts/sweep.py --data video --path /root/reference/data \
        --models apr --grid "eps=0.1,0.5,1.0;reg_adv=0.1,1.0" --epochs 400
"""

import argparse
import itertools
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))


def parse_grid(spec: str):
    axes = []
    for part in filter(None, spec.split(";")):
        name, vals = part.split("=")
        axes.append([(name, v) for v in vals.split(",")])
    return [dict(combo) for combo in itertools.product(*axes)] or [{}]


def main():
    from acf_tpu.cli.main import main as cli_main

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="video")
    ap.add_argument("--path", default="/root/reference/data")
    ap.add_argument("--models", default="apr")
    ap.add_argument("--grid", default="")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--verbose", type=int, default=25)
    ap.add_argument("--opath", default="out/sweep/")
    # anything after the known flags is forwarded to the CLI verbatim —
    # e.g. `--maxlen 8` for the Video protocol geometry (the CLI default
    # is 50; round 3 found the r1 asasrec2 sweep ran without this and was
    # therefore a maxlen-50 sweep — see docs/PARITY.md)
    args, extra = ap.parse_known_args()

    results = []
    for model in args.models.split(","):
        for combo in parse_grid(args.grid):
            argv = ["--model", model, "--data", args.data, "--path", args.path,
                    "--epochs", str(args.epochs),
                    "--adv_epoch", str(args.epochs // 2),
                    "--verbose", str(args.verbose), "--opath", args.opath]
            argv += extra
            for k, v in combo.items():
                argv += [f"--{k}", v]
            print("===", model, combo, flush=True)
            best = cli_main(argv)
            results.append({"model": model, **combo,
                            "hr10": best.get("hr"), "ndcg10": best.get("ndcg"),
                            "best_epoch": best.get("epoch")})
            print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
