#!/bin/bash
# Round-4 TPU queue, part 4: re-run the bench A/B guard with the
# lib-pinning wrapper (the first attempt's PYTHONPATH override was defeated
# by the axon sitecustomize + editable meta-path finder). Waits for queue 3.
cd /root/repo || exit 1
while ! grep -q "TPU queue 3 done" out/r4/queue3.log 2>/dev/null; do
  sleep 60
done
echo "=== stage 9: bench A/B retry ==="
bash scripts/bench_ab.sh > out/r4/bench_ab2.log 2>&1
echo "stage9 rc=$?"
echo "=== TPU queue 4 done ==="
