#!/bin/bash
# Round-4 TPU queue, part 9: same-session APL fusion A/B. Waits for queue 8.
cd /root/repo || exit 1
while ! grep -q "TPU queue 8 done" out/r4/queue9_wait_marker 2>/dev/null; do
  grep -q "TPU queue 8 done" out/r4/queue8.log 2>/dev/null && break
  sleep 60
done
echo "=== stage 15: APL capped-vs-per-epoch same-session A/B ==="
timeout 7200 python scripts/apl_fuse_ab.py > out/r4/apl_fuse_ab.json 2> out/r4/apl_fuse_ab.err
echo "stage15 rc=$?"
cat out/r4/apl_fuse_ab.json
echo "=== TPU queue 9 done ==="
