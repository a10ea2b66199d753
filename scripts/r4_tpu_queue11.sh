#!/bin/bash
# Round-4 TPU queue, part 11: DSIN final micro-sweep + the zoo-table DSIN
# row at the tuned configuration. Waits for queue 10.
cd /root/repo || exit 1
while ! grep -q "TPU queue 10 done" out/r4/queue10.log 2>/dev/null; do
  sleep 60
done
echo "=== stage 17: DSIN micro-sweep around the tuned point ==="
timeout 7200 python scripts/dsin_sweep.py \
  --configs "0.5:1e-4:bce:0.00003,0.6:1e-4:bce:0.0001" \
  --out out/r4_dsin_sweep4/ > out/r4/dsin_sweep4.log 2>&1
echo "stage17 rc=$?"
echo "=== stage 18: zoo DSIN row at tuned defaults ==="
timeout 7200 python scripts/zoo_video.py --models dsin --epochs 400 \
  --verbose 5 --out out/r4_zoo_dsin/ > out/r4/zoo_dsin_tuned.log 2>&1
echo "stage18 rc=$?"
echo "=== TPU queue 11 done ==="
