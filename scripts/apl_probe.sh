#!/bin/bash
# Driver for scripts/apl_probe.py: one config per process (the crash kills
# the TPU worker; the next process re-registers). Sequential on the one chip.
# Records rc per config — rc=0 + PROBE_OK means survived, anything else is
# the crash (or timeout).
cd /root/repo || exit 1
mkdir -p out/r4_apl_probe
S=out/r4_apl_probe/summary.txt
: > $S

run() {
  name=$1; shift
  echo "=== $name: python scripts/apl_probe.py $* ===" | tee -a $S
  timeout 2400 python scripts/apl_probe.py "$@" \
    > out/r4_apl_probe/$name.log 2>&1
  rc=$?
  tail -1 out/r4_apl_probe/$name.log | tee -a $S
  echo "$name rc=$rc" | tee -a $S
  sleep 10
}

# 1. faithful repro at HEAD (r3 observation: this crashes)
run real_b25       --mode real --block 25
# 2. does the standalone synthetic program reproduce it?
run synth_b25      --mode synth --block 25
# 3. construct ablations at the crashing shape
run synth_nogumbel --mode synth --block 25 --no-gumbel
run synth_nomask   --mode synth --block 25 --no-mask
run synth_nopaux   --mode synth --block 25 --no-paux
run synth_critic   --mode synth --block 25 --phase critic
run synth_gen      --mode synth --block 25 --phase gen
# 4. shape shrinks
run synth_b5       --mode synth --block 5
run synth_items4k  --mode synth --block 25 --items 4096
run synth_steps200 --mode synth --block 25 --steps 200
# 5. partial-fusion viability on the real model
run real_b5        --mode real --block 5

echo "=== probe done ===" | tee -a $S
