#!/bin/bash
# One-command re-probe of the APL fused-scan TPU worker crash
# (docs/APL_RUNTIME_CRASH.md). One config per process — the crash kills
# the worker; the next process re-registers. Sequential on the one chip.
cd /root/repo || exit 1
OUT=${1:-out/r5_apl_canary}
mkdir -p "$OUT"
S=$OUT/summary.txt
: > "$S"

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$S"
  timeout 2400 python "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  tail -1 "$OUT/$name.log" | tee -a "$S"
  echo "$name rc=$rc" | tee -a "$S"
  sleep 10
}

# 1. cliff lower bound: must stay ok
run synth_b12  scripts/apl_probe.py --mode synth --block 12
# 2. cliff upper bound: crash expected (ok => cliff moved up)
run synth_b18  scripts/apl_probe.py --mode synth --block 18
# 3. full repro: crash expected (ok => fixed upstream, raise the cap)
run synth_b25  scripts/apl_probe.py --mode synth --block 25
# 4. round-5 closed-form generator backward at block 25: if this passes
#    while (3) crashes, the autodiff-emitted program is the trigger and
#    manual_gen can lift max_fuse_epochs on its own
run manual_b25 scripts/apl_manual_ab.py --probe 25

echo "=== canary done ===" | tee -a "$S"
