#!/bin/bash
# Round-5 sequential TPU queue, part 1 (one v5e chip — stages serialize).
# VERDICT r4 item #5: settle the ASASRec maxlen-8 protocol row with one
# targeted, protocol-legal sweep at the reference geometry:
# eps x reg_adv x adv_epoch (the knobs the reference's own script.sh grid
# swept), seed 2019 first; best config gets seed extension in queue 2.
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== stage 1: ASASRec protocol sweep (12 cells, seed 2019) ==="
timeout 14400 python scripts/sweep.py --models asasrec --epochs 2000 \
  --verbose 20 --maxlen 8 \
  --grid "eps=0.3,0.5,0.8;reg_adv=0.5,1.0;adv_epoch=800,1000" \
  --opath out/r5_asasrec_sweep/ > $Q/asasrec_sweep.log 2>&1
echo "stage1 rc=$?"

echo "=== TPU queue 1 done ==="
