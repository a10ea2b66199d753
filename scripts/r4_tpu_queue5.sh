#!/bin/bash
# Round-4 TPU queue, part 5: validate APL capped fusion at scale + locate
# the crash boundary. Waits for queue 4.
cd /root/repo || exit 1
while ! grep -q "TPU queue 4 done" out/r4/queue4.log 2>/dev/null; do
  sleep 60
done

echo "=== stage 10: APL crash boundary (blocks 12 / 18) ==="
mkdir -p out/r4_apl_probe
for b in 12 18; do
  timeout 2400 python scripts/apl_probe.py --mode synth --block $b \
    > out/r4_apl_probe/synth_b$b.log 2>&1
  echo "synth_b$b rc=$?" | tee -a out/r4_apl_probe/summary.txt
  tail -1 out/r4_apl_probe/synth_b$b.log >> out/r4_apl_probe/summary.txt
  sleep 10
done

echo "=== stage 11: APL zoo re-run under capped fusion ==="
timeout 7200 python scripts/zoo_video.py --models apl --epochs 400 \
  --verbose 25 --out out/r4_zoo_apl/ > out/r4/zoo_apl_capped.log 2>&1
echo "stage11 rc=$?"

echo "=== TPU queue 5 done ==="
