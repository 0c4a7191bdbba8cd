#!/bin/bash
# Round-4 queue 6: full-bench A/B of the fused canvas eval path.
#
#   19: headline bench, LINTRANSUNET_FUSED_S1=1
#   20: headline bench, default (same-session baseline)
#   21: roi32/sw4 geometry with the fused path
#   22: eval trace with the fused path (where did the copy/stat budget go)
set -u
cd /root/repo
mkdir -p /tmp/r4q6
R=/tmp/r4q6

if [ -f /tmp/r4q5.pid ]; then
  while kill -0 "$(cat /tmp/r4q5.pid)" 2>/dev/null; do sleep 30; done
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

run 19_fused        2400 LINTRANSUNET_FUSED_S1=1 -- python bench.py --runs 4
run 20_default      2400 -- python bench.py --runs 4
run 21_fused_roi32  2400 LINTRANSUNET_FUSED_S1=1 -- python bench.py --runs 4 --roi_depth 32 --sw_batch 4
run 22_trace_fused  2400 LINTRANSUNET_FUSED_S1=1 -- python experiments/profile_xplane.py --top 40

echo "QUEUE6 DONE $(date)" | tee -a $R/results.log
