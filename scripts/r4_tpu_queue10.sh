#!/bin/bash
# Round-4 TPU queue, part 10: APL op-level profile. Waits for queue 9.
cd /root/repo || exit 1
while ! grep -q "TPU queue 9 done" out/r4/queue9.log 2>/dev/null; do
  sleep 60
done
echo "=== stage 16: APL step profile ==="
timeout 3600 python scripts/profile_apl_step.py > out/r4/apl_profile.jsonl 2> out/r4/apl_profile.err
echo "stage16 rc=$?"
head -8 out/r4/apl_profile.jsonl
echo "=== TPU queue 10 done ==="
