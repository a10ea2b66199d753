#!/bin/bash
# Round-4 sequential TPU queue, part 1 (one v5e chip — stages serialize).
# VERDICT r3 items #1 (zoo tail), #6 (presplit loader at scale),
# #5 (sampled-eval protocol at scale).
cd /root/repo || exit 1
mkdir -p out/r4
Q=out/r4

echo "=== stage 1: zoo tail — pop anchor + mrv/mfv/av + DSIN (VERDICT #1) ==="
timeout 7200 python scripts/zoo_video.py \
  --models pop,mrv,mfv,av,dsin --epochs 400 --verbose 25 \
  --out out/r4_zoo/ > $Q/zoo_tail.log 2>&1
echo "stage1 rc=$?"

echo "=== stage 2: presplit Video-pre BPR 2000-epoch parity (VERDICT #6) ==="
timeout 3600 python scripts/multiseed.py --model bpr --seeds 2019 \
  --epochs 2000 --verbose 20 --data Video-pre --opath out/r4_presplit/ \
  > $Q/presplit_bpr.log 2>&1
echo "stage2 rc=$?"

echo "=== stage 3: sampled-eval protocol at scale (VERDICT #5) ==="
timeout 3600 python scripts/multiseed.py --model bpr --seeds 2019 \
  --epochs 2000 --verbose 20 --opath out/r4_sampled/ \
  --eval_mode sample > $Q/sampled_bpr.log 2>&1
echo "stage3 rc=$?"

echo "=== TPU queue 1 done ==="
