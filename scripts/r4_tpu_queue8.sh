#!/bin/bash
# Round-4 TPU queue, part 8: dispatch-latency probe (interprets bench A/B
# leg C) + final zoo table refresh for DSIN with its best config. Waits for
# queue 7.
cd /root/repo || exit 1
while ! grep -q "TPU queue 7 done" out/r4/queue7.log 2>/dev/null; do
  sleep 60
done
echo "=== stage 14: dispatch latency probe ==="
timeout 1200 python scripts/dispatch_latency.py > out/r4/dispatch_latency.json 2> out/r4/dispatch_latency.err
echo "stage14 rc=$?"
cat out/r4/dispatch_latency.json
echo "=== TPU queue 8 done ==="
