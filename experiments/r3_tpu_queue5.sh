#!/bin/bash
# Round-3 queue 5: post-default-flip validation + the wide-paired A/B.
#
#   33: default bench — the shipping config the driver will capture
#       (paired + barrier=both + split defaults, commit d016a51)
#   34: default train bench (paired now default)
#   35: sw2 re-measure post re-chunking (expect == job 33)
#   36: roi32/sw4 re-measure post re-chunking
#   37: PAIRED_MAX4C=128 — pair the 4C=128 levels too (chain bench +25% at L1)
#   38: PAIRED_MAX4C=128 training step
set -u
cd /root/repo
mkdir -p /tmp/r3q5
R=/tmp/r3q5

if [ -f /tmp/r3q4.pid ]; then
  while kill -0 "$(cat /tmp/r3q4.pid)" 2>/dev/null; do sleep 30; done
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

run 33_default        2400 -- python bench.py --runs 4
run 34_train_default  3600 -- python bench.py --train --runs 5
run 35_sw2            2400 -- python bench.py --sw_batch 2 --runs 4
run 36_roi32_sw4      2400 -- python bench.py --roi_depth 32 --sw_batch 4 --runs 4
run 37_paired128      2400 LINTRANSUNET_PAIRED_MAX4C=128 -- python bench.py --runs 4
run 38_train_paired128 3600 LINTRANSUNET_PAIRED_MAX4C=128 -- python bench.py --train --runs 5

echo "QUEUE5 DONE $(date)" | tee -a $R/results.log
