#!/bin/bash
# Round-5 sequential TPU queue, part 4.
# - ASASRec eps=0.8 stability probe: seeds 2021/2023 collapsed to ~0.065
#   under (0.8, reg_adv=0.5, adv_epoch=800) — an adversarial-phase
#   bifurcation (clean phase was healthy; the post-shock recovery finds
#   either ~0.10 or ~0.065). Does the stronger reg_adv=1.0 cell hold on
#   exactly those seeds?
# - APL three-way A/B (autodiff / closed-form / Pallas fused kernels).
# - Fused-kernel crash probe at block 25 (own process).
cd /root/repo || exit 1
mkdir -p out/r5
Q=out/r5

echo "=== stage 1: eps=0.8 reg_adv=1.0 on the collapsing seeds ==="
timeout 7200 python scripts/multiseed.py --model asasrec \
  --seeds 2021,2023 --epochs 2000 --verbose 20 \
  --opath out/r5_asasrec_seeds_r1/ \
  --maxlen 8 --eps 0.8 --reg_adv 1.0 --adv_epoch 800 \
  > $Q/asasrec_seeds_r1a.log 2>&1
echo "stage1 rc=$?"

echo "=== stage 2: eps=0.8 reg_adv=1.0 on the remaining seeds ==="
timeout 7200 python scripts/multiseed.py --model asasrec \
  --seeds 2020,2022,2024 --epochs 2000 --verbose 20 \
  --opath out/r5_asasrec_seeds_r1/ \
  --maxlen 8 --eps 0.8 --reg_adv 1.0 --adv_epoch 800 \
  > $Q/asasrec_seeds_r1b.log 2>&1
echo "stage2 rc=$?"

echo "=== stage 3: APL three-way gen-backward A/B ==="
timeout 3600 python scripts/apl_manual_ab.py --epochs 10 \
  > $Q/apl_threeway_ab2.log 2>&1
echo "stage3 rc=$?"

echo "=== stage 4: fused-kernel crash probe at block 25 (own process) ==="
timeout 2400 python - > $Q/apl_fused_probe25.log 2>&1 <<'EOF'
import jax, os, time, json
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))
import optax
from acf_tpu.data import load_dataset
from acf_tpu.models import APL
from acf_tpu.train import TrainConfig, Trainer

data = load_dataset("video", "/root/reference/data")
model = APL(data.num_users, data.num_items, 64, fused_gen=True)
model.max_fuse_epochs = 25
tr = Trainer(model, data, optax.sgd(0.05),
             TrainConfig(batch_size=512, verbose=10 ** 9))
t0 = time.time()
tr.run_epochs(25)
float(tr.params["g"]["P"][0, 0])
print(json.dumps({"fused_probe_epochs": 25, "ok": True,
                  "wall_s": round(time.time() - t0, 1)}))
EOF
echo "stage4 rc=$?"

echo "=== TPU queue 4 done ==="
