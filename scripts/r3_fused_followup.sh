#!/bin/bash
# Same-session T=50 A/B with dtype-matched partners: the stage-1 comparison
# (fused-bf16 vs XLA-f32) confounds kernel and dtype. Run after the main
# queue frees the chip.
cd /root/repo || exit 1
mkdir -p out/r3
DECOMPOSE_MAXLEN=50 \
DECOMPOSE_ONLY=sasrec-xla,sasrec-xla-bf16,sasrec-bf16k,asasrec-xla,asasrec-xla-bf16,asasrec-bf16k \
  timeout 5400 python scripts/seq_step_decompose.py \
  > out/r3/fused_t50_dtype.jsonl 2> out/r3/fused_t50_dtype.err
echo "followup rc=$?"
