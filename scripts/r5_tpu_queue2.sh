#!/bin/bash
# Round-5 sequential TPU queue, part 2.
# VERDICT r4 #2 (APL gen-phase fusion A/B), #7 (crash canary),
# #4 (widened bench validation) + the on-TPU verify drive.
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== stage 1: APL manual-vs-autodiff gen backward A/B (VERDICT #2) ==="
timeout 3600 python scripts/apl_manual_ab.py --epochs 10 \
  > $Q/apl_manual_ab.log 2>&1
echo "stage1 rc=$?"

echo "=== stage 2: APL crash canary (VERDICT #7; 4 isolated processes) ==="
bash scripts/apl_canary.sh out/r5_apl_canary > $Q/apl_canary.log 2>&1
echo "stage2 rc=$?"

echo "=== stage 3: widened bench.py on TPU (VERDICT #4) ==="
timeout 3600 python bench.py > $Q/bench_widened.log 2>&1
echo "stage3 rc=$?"

echo "=== stage 4: verify drive on TPU (fit_two_phase quick-start) ==="
timeout 3600 python - > $Q/verify_drive.log 2>&1 <<'EOF'
import jax, os
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))
import optax
from acf_tpu.data import load_dataset
from acf_tpu.train import TrainConfig
from acf_tpu.models.mf import MFBPR
from acf_tpu.train.trainer import fit_two_phase
from acf_tpu.utils.io import OutputWriter

data = load_dataset("video", "/root/reference/data", nrows=60000)
clean = MFBPR(data.num_users, data.num_items, 64)
adv = MFBPR(data.num_users, data.num_items, 64, adversarial=True)
best = fit_two_phase(clean, adv, data,
                     optax.adagrad(0.05, initial_accumulator_value=0.1),
                     TrainConfig(batch_size=512, epochs=6, verbose=1,
                                 ckpt_path="/tmp/acf_ck_r5/video"),
                     adv_epoch=3,
                     writer=OutputWriter("/tmp/acf_out_r5/", "demo"), tag="")
print("BEST", {k: v for k, v in best.items() if k != "result"})
assert best["hr"] > 0
print("VERIFY_DRIVE_OK")
EOF
echo "stage4 rc=$?"

echo "=== TPU queue 2 done ==="
