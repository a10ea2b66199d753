#!/bin/bash
# Round-4 sequential TPU queue, part 2. Waits for queue 1 to release the
# chip, then: DSIN regularization sweep, bench verify, bench A/B guard
# (VERDICT #4), and — last, because it deliberately crashes the TPU worker —
# the APL fused-scan probe (VERDICT #2).
cd /root/repo || exit 1
mkdir -p out/r4
Q=out/r4

while ! grep -q "TPU queue 1 done" out/r4/queue1.log 2>/dev/null; do
  sleep 60
done

echo "=== stage 4: DSIN capacity-control sweep ==="
timeout 10800 python scripts/dsin_sweep.py > $Q/dsin_sweep.log 2>&1
echo "stage4 rc=$?"

echo "=== stage 5: bench.py (verify surface) ==="
timeout 1800 python bench.py > $Q/bench_verify.json 2> $Q/bench_verify.err
echo "stage5 rc=$?"
cat $Q/bench_verify.json

echo "=== stage 6: bench A/B statistical guard (VERDICT #4) ==="
bash scripts/bench_ab.sh > $Q/bench_ab.log 2>&1
echo "stage6 rc=$?"

echo "=== stage 7: APL fused-scan crash probe (VERDICT #2) ==="
bash scripts/apl_probe.sh > $Q/apl_probe.log 2>&1
echo "stage7 rc=$?"

echo "=== TPU queue 2 done ==="
