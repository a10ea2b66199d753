#!/bin/bash
# Round-5 sequential TPU queue, part 6: staged-epsilon ASASRec on the
# remaining protocol seeds (2021/2023 — the seeds that collapsed under
# fixed eps=0.8 — already recovered to 0.0998/0.1016 with the schedule;
# out/r5/asasrec_staged.log). All six seeds beating 0.0993 closes the
# protocol row outright.
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== staged-eps ASASRec seeds 2019,2020,2022,2024 ==="
timeout 14400 python scripts/asasrec_eps_staged.py \
  --seeds 2019,2020,2022,2024 \
  --adv_epoch 800 --stage2 1100 --epochs 2000 --reg_adv 0.5 \
  > $Q/asasrec_staged2.log 2>&1
echo "stage1 rc=$?"

echo "=== TPU queue 6 done ==="
