#!/bin/bash
# Round-4 queue 1: post-fix validation + fresh traces.
#
#   01: default bench — fresh session baseline (post queue-5/6/7 verdicts,
#       defaults unchanged: paired<=64 + barrier=both + split)
#   02: sw2 post runner-re-chunk fix (expect == job 01; was 194.6 with the
#       pad-window bug)
#   03: roi32/sw4 post fix (was 222.7 paying 12 forwards for 11 windows)
#   04: train bench (fresh; queue-5 measured 244.6)
#   05: xplane trace of the eval window at the shipping defaults — the
#       fresh copy-budget map for the round-4 layout attack (the round-3
#       28.8 ms/window figure predates the paired default)
#   06: xplane trace of the train step — the round-4 backward ledger
#   07: train_batch=3 (the reference's per-device batch, train3D.py:44-49);
#       generous timeout — diagnosing the round-3 compiler SIGKILL
set -u
cd /root/repo
mkdir -p /tmp/r4q1
R=/tmp/r4q1

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

run 01_default     2400 -- python bench.py --runs 4
run 02_sw2         2400 -- python bench.py --sw_batch 2 --runs 4
run 03_roi32_sw4   2400 -- python bench.py --roi_depth 32 --sw_batch 4 --runs 4
run 04_train       3600 -- python bench.py --train --runs 5
run 05_trace_eval  2400 -- python experiments/profile_xplane.py --top 60
run 06_trace_train 3600 -- python experiments/profile_xplane.py --train --top 60
run 07_train_b3    5400 -- python bench.py --train --train_batch 3 --runs 3

echo "QUEUE1 DONE $(date)" | tee -a $R/results.log
