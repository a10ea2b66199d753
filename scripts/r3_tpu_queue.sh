#!/bin/bash
# Round-3 sequential TPU queue (one v5e chip — stages must serialize).
# Logs per stage under out/r3/; run under nohup/background from repo root.
cd /root/repo || exit 1
mkdir -p out/r3
Q=out/r3

echo "=== stage 1: fused-kernel T=50 A/B (VERDICT r2 #2) ==="
DECOMPOSE_MAXLEN=50 \
DECOMPOSE_ONLY=sasrec-xla,asasrec-xla,sasrec-bf16k,asasrec-bf16k \
  timeout 5400 python scripts/seq_step_decompose.py \
  > $Q/fused_t50.jsonl 2> $Q/fused_t50.err
echo "stage1 rc=$?"

echo "=== stage 2: multiseed f32 maxlen-8 protocol (VERDICT r2 #1) ==="
timeout 3600 python scripts/multiseed.py --model bpr \
  --seeds 2019,2020,2021 --epochs 2000 --verbose 20 \
  --opath out/r3_multiseed_m8/ > $Q/ms_bpr.log 2>&1
echo "bpr rc=$?"
timeout 5400 python scripts/multiseed.py --model apr \
  --seeds 2019,2020,2021 --epochs 2000 --verbose 20 \
  --opath out/r3_multiseed_m8/ > $Q/ms_apr.log 2>&1
echo "apr rc=$?"
timeout 7200 python scripts/multiseed.py --model sasrec \
  --seeds 2019,2020,2021 --epochs 2000 --verbose 20 \
  --opath out/r3_multiseed_m8/ --maxlen 8 > $Q/ms_sasrec.log 2>&1
echo "sasrec rc=$?"
timeout 14400 python scripts/multiseed.py --model asasrec \
  --seeds 2019,2020,2021,2022,2023 --epochs 2000 --verbose 20 \
  --opath out/r3_multiseed_m8/ --maxlen 8 > $Q/ms_asasrec.log 2>&1
echo "asasrec rc=$?"

echo "=== stage 3: asasrec maxlen-50 tuned config (r1-table root cause) ==="
timeout 14400 python scripts/multiseed.py --model asasrec \
  --seeds 2019,2020 --epochs 2000 --verbose 20 \
  --opath out/r3_asasrec_m50/ --maxlen 50 > $Q/ms_asasrec_m50.log 2>&1
echo "m50 rc=$?"

echo "=== stage 4: bf16 second seed (VERDICT r2 #5) ==="
timeout 5400 python scripts/multiseed.py --model sasrec --seeds 2020 \
  --epochs 2000 --verbose 20 --opath out/r3_bf16/ --maxlen 8 \
  --train_dtype bfloat16 > $Q/ms_sasrec_bf16.log 2>&1
echo "bf16 sasrec rc=$?"
timeout 5400 python scripts/multiseed.py --model asasrec --seeds 2020 \
  --epochs 2000 --verbose 20 --opath out/r3_bf16/ --maxlen 8 \
  --train_dtype bfloat16 > $Q/ms_asasrec_bf16.log 2>&1
echo "bf16 asasrec rc=$?"

echo "=== TPU queue done ==="
