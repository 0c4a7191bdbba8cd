#!/bin/bash
# Round-4 queue 3: the dpack (depth-major packing) formulation probe.
set -u
cd /root/repo
mkdir -p /tmp/r4q3
R=/tmp/r4q3

if [ -f /tmp/r4q2.pid ]; then
  while kill -0 "$(cat /tmp/r4q2.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  local name=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name [env: ${envs[*]:-none}] $(date)" | tee -a $R/results.log
  env "${envs[@]}" timeout "$to" "$@" > "$R/$name.out" 2> "$R/$name.err"
  local rc=$?
  tail -6 "$R/$name.out" | tee -a $R/results.log
  echo "--- rc=$rc $(date)" | tee -a $R/results.log
}

run 11_dpack_probe 2400 -- python experiments/dpack_probe.py

echo "QUEUE3 DONE $(date)" | tee -a $R/results.log
