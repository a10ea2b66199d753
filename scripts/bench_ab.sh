#!/bin/bash
# Statistical guard for the bench metric (VERDICT r3 #4): disentangle
# axon-tunnel noise from real program regressions behind the
# BENCH_r01->r03 9.23M -> 8.99M drift.
#
# Context the raw BENCH files hide: the r1 bench was a DIFFERENT program —
# Video-shaped data with one dispatch per epoch — while r2/r3 run the
# ml-1m-shaped workload through the fused run_epochs block. So r1->r2 is a
# workload change, not drift; only r2->r3 is like-for-like.
#
# Interleaved same-session-window trials (A,B,C per round, 3 rounds):
#   A: HEAD bench.py + HEAD library        (the current metric)
#   B: HEAD bench.py + r2-final library    (same workload, old APR program)
#   C: r1-final bench.py + r1-final library (the 9.23M program, re-run today)
# B vs A isolates library changes since r2 under identical harness/workload;
# C shows what the r1 number measures under today's tunnel conditions.
cd /root/repo || exit 1
mkdir -p out/r4_benchab
Q=out/r4_benchab
R2=$(git rev-parse '6f973d9^')   # last r2 code commit
R1=53ca5d5                       # last r1 code commit

[ -d /tmp/acf_wt_r2 ] || git worktree add --detach /tmp/acf_wt_r2 "$R2"
[ -d /tmp/acf_wt_r1 ] || git worktree add --detach /tmp/acf_wt_r1 "$R1"

for round in 1 2 3; do
  echo "--- round $round A (HEAD lib) ---"
  timeout 1800 python bench.py > $Q/A_$round.json 2> $Q/A_$round.err
  echo "A rc=$?"
  echo "--- round $round B (r2 lib, HEAD harness) ---"
  timeout 1800 python scripts/_bench_with_lib.py /tmp/acf_wt_r2 bench.py \
    > $Q/B_$round.json 2> $Q/B_$round.err
  echo "B rc=$?"
  echo "--- round $round C (r1 harness + lib) ---"
  (cd /tmp/acf_wt_r1 && timeout 1800 python /root/repo/scripts/_bench_with_lib.py \
    /tmp/acf_wt_r1 /tmp/acf_wt_r1/bench.py) > $Q/C_$round.json 2> $Q/C_$round.err
  echo "C rc=$?"
done

echo "=== bench A/B done ==="
for f in $Q/[ABC]_*.json; do echo "$f: $(tail -1 $f)"; done
