#!/bin/bash
# Round-4 TPU queue, part 3: DSIN pairwise-loss sweep (the bce configs all
# memorize; see out/r4_dsin_sweep/). Waits for queue 2 to release the chip.
cd /root/repo || exit 1
mkdir -p out/r4
Q=out/r4

while ! grep -q "TPU queue 2 done" out/r4/queue2.log 2>/dev/null; do
  sleep 60
done

echo "=== stage 8: DSIN bpr-loss sweep ==="
timeout 10800 python scripts/dsin_sweep.py \
  --configs "0.3:1e-4:bpr,0.5:1e-4:bpr,0.3:1e-3:bpr,0.1:1e-4:bpr" \
  --out out/r4_dsin_sweep2/ > $Q/dsin_sweep2.log 2>&1
echo "stage8 rc=$?"

echo "=== TPU queue 3 done ==="
