#!/bin/bash
# Round-5 sequential TPU queue, part 3.
# VERDICT r4 #5 follow-up: seed extension of the sweep's winning ASASRec
# cell (eps=0.8, reg_adv=0.5, adv_epoch=800 — 0.1042 at seed 2019 vs the
# reference's 0.0993) toward an every-seed-beats protocol row.
# VERDICT r4 #6: DSIN Bi-GRU at the tuned config, uni-vs-bi same-session.
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== stage 1: ASASRec eps=0.8 protocol seeds 2020-2024 ==="
timeout 14400 python scripts/multiseed.py --model asasrec \
  --seeds 2020,2021,2022,2023,2024 --epochs 2000 --verbose 20 \
  --opath out/r5_asasrec_seeds/ \
  --maxlen 8 --eps 0.8 --reg_adv 0.5 --adv_epoch 800 \
  > $Q/asasrec_seeds.log 2>&1
echo "stage1 rc=$?"

echo "=== stage 2: DSIN Bi-GRU vs uni at the tuned config (400 epochs) ==="
timeout 14400 python scripts/dsin_sweep.py --epochs 400 --verbose 5 \
  --out out/r5_dsin_bi/ \
  --configs "0.5:1e-4:bce:1e-4,0.5:1e-4:bce:1e-4:bi,0.5:1e-4:bpr:1e-4,0.5:1e-4:bpr:1e-4:bi" \
  > $Q/dsin_bi.log 2>&1
echo "stage2 rc=$?"

echo "=== TPU queue 3 done ==="
