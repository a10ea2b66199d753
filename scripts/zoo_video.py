"""Train the whole model zoo on Video (real data) and record best metrics.

No reference numbers exist for most of these on Video (BASELINE.md covers
BPR/APR/SASRec/ASASRec, reproduced by scripts/parity_video.py); this run
demonstrates every family training at real scale on TPU and provides the
framework's own reference table.
"""

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import optax  # noqa: E402

from acf_tpu.adversarial import PopularityAdversarial  # noqa: E402
from acf_tpu.data import load_dataset  # noqa: E402
from acf_tpu.models import (  # noqa: E402
    APL, DRCF, DREAM, IRGAN, MFBPR, AlreadyVisit, Caser, GRU4Rec,
    MostFrequentlyVisit, MostPopular, MostRecentlyVisit, NeuMF, PointwiseMF,
)

# score-table baselines: one no-op epoch, like the reference's early break
# (run.py:275-276)
NAIVE = ("pop", "mrv", "mfv", "av")
from acf_tpu.train import TrainConfig, Trainer  # noqa: E402
from acf_tpu.utils.io import OutputWriter  # noqa: E402


def build(name, data, maxlen):
    U, I = data.num_users, data.num_items
    adam = optax.adam(0.001)
    if name == "mf":
        return PointwiseMF(U, I, 64), adam
    if name == "neumf":
        return NeuMF(U, I, 64), adam
    if name == "amf":
        return PopularityAdversarial(U, I, 64, base=PointwiseMF(U, I, 64),
                                     weight=0.001), adam
    if name == "abpr":
        return PopularityAdversarial(U, I, 64, base=MFBPR(U, I, 64),
                                     weight=0.001), adam
    if name == "gru4rec":
        return GRU4Rec(U, I, 64, maxlen=maxlen), adam
    if name == "dream":
        return DREAM(U, I, 64, maxlen=maxlen), adam
    if name == "drcf":
        return DRCF(U, I, 64, maxlen=5), adam
    if name == "caser":
        return Caser(U, I, 64, maxlen=5), adam
    if name == "irgan":
        return IRGAN(U, I, 64), optax.sgd(0.001)
    if name == "apl":
        return APL(U, I, 64), optax.sgd(0.05)
    if name == "dsin":
        from acf_tpu.models.dsin import DSIN
        # Video mean history ≈ 9 items → 2 sessions of 4 keeps the whole
        # protocol window (maxlen 8) while still exercising the
        # session-evolution GRU across >1 session; tuned lr 1e-4
        # (round-4 sweep — see models/dsin.py)
        return DSIN(U, I, 64, sess_count=2, sess_len=4), optax.adam(1e-4)
    if name == "pop":
        return MostPopular(U, I, 64, data=data), adam
    if name == "mrv":
        return MostRecentlyVisit(U, I, 64, data=data), adam
    if name == "mfv":
        return MostFrequentlyVisit(U, I, 64, data=data), adam
    if name == "av":
        return AlreadyVisit(U, I, 64, data=data), adam
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--verbose", type=int, default=25)
    ap.add_argument("--models", type=str,
                    default="pop,mrv,mfv,av,mf,neumf,amf,abpr,gru4rec,dream,"
                            "caser,drcf,dsin,irgan,apl")
    ap.add_argument("--out", type=str, default="out/zoo/")
    args = ap.parse_args()

    data = load_dataset("video", "/root/reference/data")
    maxlen = 8  # mean Video history (run.py:165 convention)
    results = []
    for name in args.models.split(","):
        print(f"=== {name} ===", flush=True)
        model, opt = build(name, data, maxlen)
        epochs = 1 if name in NAIVE else args.epochs
        cfg = TrainConfig(batch_size=512, epochs=epochs, verbose=args.verbose)
        t0 = time.time()
        tr = Trainer(model, data, opt, cfg,
                     OutputWriter(args.out, f"video_{name}"))
        if name in ("apl", "irgan"):
            # reference protocol: generator warm-started from trained BPR
            # (APL.py:68-78, IRGAN.py:29-34)
            pre = Trainer(MFBPR(data.num_users, data.num_items, 64), data,
                          optax.adagrad(0.05, initial_accumulator_value=0.1),
                          TrainConfig(batch_size=512, epochs=0))
            for _ in range(200):
                pre.run_epoch()
            tr.params["g"] = dict(pre.params)
        best = tr.fit()
        r = {"model": name, "hr10": best.get("hr"), "ndcg10": best.get("ndcg"),
             "best_epoch": best.get("epoch"),
             "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(r), flush=True)
        results.append(r)
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
