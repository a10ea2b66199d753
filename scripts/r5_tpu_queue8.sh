#!/bin/bash
# Round-5 sequential TPU queue, part 8: extend the staged-epsilon
# protocol row to 10 seeds (2019-2024 measured; add 2025-2028) — the
# every-seed-beats-or-ties claim gets the same seed depth as the other
# flagship rows.
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== staged-eps ASASRec seeds 2025-2028 ==="
timeout 14400 python scripts/asasrec_eps_staged.py \
  --seeds 2025,2026,2027,2028 \
  --adv_epoch 800 --stage2 1100 --epochs 2000 --reg_adv 0.5 \
  > $Q/asasrec_staged3.log 2>&1
echo "stage1 rc=$?"

echo "=== TPU queue 8 done ==="
