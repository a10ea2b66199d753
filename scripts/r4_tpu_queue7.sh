#!/bin/bash
# Round-4 TPU queue, part 7: 4 more ASASRec seeds at the exact maxlen-8
# protocol (VERDICT r3 weak #7 — the flagship row is a statistical tie at
# 8 seeds; 12 seeds tighten the mean's CI). Waits for queue 6.
cd /root/repo || exit 1
while ! grep -q "TPU queue 6 done" out/r4/queue6.log 2>/dev/null; do
  sleep 60
done
echo "=== stage 13: ASASRec protocol seeds 2027-2030 ==="
timeout 14400 python scripts/multiseed.py --model asasrec \
  --seeds 2027,2028,2029,2030 --epochs 2000 --verbose 20 \
  --opath out/r4_asasrec_extra/ --maxlen 8 > out/r4/ms_asasrec_extra.log 2>&1
echo "stage13 rc=$?"
echo "=== TPU queue 7 done ==="
