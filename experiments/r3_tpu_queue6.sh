#!/bin/bash
# Round-3 queue 6: paired3d A/B + winner stacking.
set -u
cd /root/repo
mkdir -p /tmp/r3q6
R=/tmp/r3q6

if [ -f /tmp/r3q5.pid ]; then
  while kill -0 "$(cat /tmp/r3q5.pid)" 2>/dev/null; do sleep 30; done
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

run 39_paired3d          2400 LINTRANSUNET_PAIRED_S1=3d -- python bench.py --runs 4
run 40_paired3d_wide     2400 LINTRANSUNET_PAIRED_S1=3d LINTRANSUNET_PAIRED_MAX4C=128 -- python bench.py --runs 4
run 41_train_paired3d    3600 LINTRANSUNET_PAIRED_S1=3d -- python bench.py --train --runs 5

echo "QUEUE6 DONE $(date)" | tee -a $R/results.log
