#!/bin/bash
# Round-5 sequential TPU queue, part 7: re-earn the quality rows whose
# code paths changed this round.
# - APL zoo row at 400 epochs: the generator backward default switched
#   from autodiff to the closed-form gen_step_manual (float-tolerance
#   equivalent per step, so the 2000-step trajectory drifts within
#   rounding) — the at-scale row must be re-measured, not assumed.
# - Sampled-eval BPR 2000 epochs: the negative GENERATOR was vectorized
#   (same popularity-weighted semantics, different draw sequence) — the
#   training trajectory is bit-identical, but the eval candidate sets
#   differ, so the sampled-protocol number needs a fresh measurement.
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== stage 1: APL zoo row, 400 epochs, manual_gen default ==="
timeout 7200 python scripts/zoo_video.py --models apl --epochs 400 \
  --verbose 25 --out out/r5_zoo_apl/ > $Q/zoo_apl_manual.log 2>&1
echo "stage1 rc=$?"

echo "=== stage 2: sampled-eval BPR 2000 epochs (vectorized sampler) ==="
timeout 3600 python scripts/multiseed.py --model bpr --seeds 2019 \
  --epochs 2000 --verbose 20 --opath out/r5_sampled/ \
  --eval_mode sample > $Q/sampled_bpr.log 2>&1
echo "stage2 rc=$?"

echo "=== TPU queue 7 done ==="
