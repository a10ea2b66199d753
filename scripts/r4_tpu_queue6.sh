#!/bin/bash
# Round-4 TPU queue, part 6: DSIN low-lr sweep (every lr=1e-3 config peaks
# after ONE epoch then memorizes — slow the convergence down). Waits for
# queue 5.
cd /root/repo || exit 1
while ! grep -q "TPU queue 5 done" out/r4/queue5.log 2>/dev/null; do
  sleep 60
done
echo "=== stage 12: DSIN low-lr sweep ==="
timeout 10800 python scripts/dsin_sweep.py \
  --configs "0.5:1e-4:bpr:0.0001,0.5:1e-4:bce:0.0001,0.3:1e-4:bce:0.0003" \
  --out out/r4_dsin_sweep3/ > out/r4/dsin_sweep3.log 2>&1
echo "stage12 rc=$?"
echo "=== TPU queue 6 done ==="
