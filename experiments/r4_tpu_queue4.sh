#!/bin/bash
# Round-4 queue 4: paired boundary-tap formulation A/B (pads vs bd vs ext).
#
# The round-4 trace clocks the 4C-wide boundary convs at 12-48 TF/s (MXU
# K=N underutilization); "bd" runs both taps as one block-diagonal K=N=8C
# conv (same operand bytes as pads), "ext" folds everything into a single
# K=16C conv (one stat-fusable output pass, re-materialised x8 lanes).
#
#   12: default bench (session baseline, pads)
#   13: PAIRED_S1=bd
#   14: PAIRED_S1=ext
#   15: train bench, PAIRED_S1=bd (clean-host reference: 182.8, queue-2)
#   16: train bench, default (same-session train baseline)
set -u
cd /root/repo
mkdir -p /tmp/r4q4
R=/tmp/r4q4

if [ -f /tmp/r4q3.pid ]; then
  while kill -0 "$(cat /tmp/r4q3.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  local name=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name [env: ${envs[*]:-none}] $(date)" | tee -a $R/results.log
  env "${envs[@]}" timeout "$to" "$@" > "$R/$name.out" 2> "$R/$name.err"
  local rc=$?
  tail -1 "$R/$name.out" | tee -a $R/results.log
  echo "--- rc=$rc $(date)" | tee -a $R/results.log
}

run 12_default      2400 -- python bench.py --runs 4
run 13_bd           2400 LINTRANSUNET_PAIRED_S1=bd -- python bench.py --runs 4
run 14_ext          2400 LINTRANSUNET_PAIRED_S1=ext -- python bench.py --runs 4
run 15_train_bd     3600 LINTRANSUNET_PAIRED_S1=bd -- python bench.py --train --runs 5
run 16_train_def    3600 -- python bench.py --train --runs 5

echo "QUEUE4 DONE $(date)" | tee -a $R/results.log
