#!/bin/bash
# Round-3 queue 7: IN-stats dot A/B (stacks on whatever queue 6 decides).
set -u
cd /root/repo
mkdir -p /tmp/r3q7
R=/tmp/r3q7

if [ -f /tmp/r3q6.pid ]; then
  while kill -0 "$(cat /tmp/r3q6.pid)" 2>/dev/null; do sleep 30; done
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

run 42_instats_dot        2400 LINTRANSUNET_IN_STATS=dot -- python bench.py --runs 4
run 43_instats_dot_p3d    2400 LINTRANSUNET_IN_STATS=dot LINTRANSUNET_PAIRED_S1=3d -- python bench.py --runs 4
run 44_instats_dot_p3d_wide 2400 LINTRANSUNET_IN_STATS=dot LINTRANSUNET_PAIRED_S1=3d LINTRANSUNET_PAIRED_MAX4C=128 -- python bench.py --runs 4

echo "QUEUE7 DONE $(date)" | tee -a $R/results.log
