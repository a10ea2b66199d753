#!/bin/bash
# Round-5 sequential TPU queue, part 5.
# - Staged-epsilon stabilization on the collapsing seeds (the eps=0.8
#   bifurcation fix hypothesis — scripts/asasrec_eps_staged.py).
# - asasrec2 at eps=0.8: stack the round-5 eps finding on the reference's
#   own asasrec2 surface (its r3 sweep ran at eps=0.5).
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== stage 1: staged-eps ASASRec on collapsing seeds 2021/2023 ==="
timeout 7200 python scripts/asasrec_eps_staged.py --seeds 2021,2023 \
  --adv_epoch 800 --stage2 1100 --epochs 2000 --reg_adv 0.5 \
  > $Q/asasrec_staged.log 2>&1
echo "stage1 rc=$?"

echo "=== stage 2: asasrec2 eps=0.8 probe (seed 2019, 2 cells) ==="
timeout 7200 python scripts/sweep.py --models asasrec2 --epochs 2000 \
  --verbose 20 --maxlen 8 \
  --grid "eps=0.8;reg_adv=0.5;adv_epoch=800;eps_pos=0.01;eps_dense=0.01,0.1;eps_conv=0.01" \
  --opath out/r5_asasrec2_e08/ > $Q/asasrec2_e08.log 2>&1
echo "stage2 rc=$?"

echo "=== TPU queue 5 done ==="
