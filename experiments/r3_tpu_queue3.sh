#!/bin/bash
# Round-3 third TPU queue: leftovers that don't depend on the queue-2
# default-flip decisions.
#
#   25: fused-QKV projection A/B on top of paired (the presumptive default)
#   26: xplane trace of the eval forward at window batch 2 — the sw_batch>1
#       regression is mostly MODEL-side (sw_batch_probe: 112.6 -> 145.4
#       ms/window standalone), this attributes it
#   27: scan-split OOM fix validation: the sw2 + split combination that
#       OOMed in queue 1 (24 GB stacked buffer) re-run post-fix
set -u
cd /root/repo
mkdir -p /tmp/r3q3
R=/tmp/r3q3

# Serialise against queue 2 (one TPU job at a time).
if [ -f /tmp/r3q2.pid ]; then
  while kill -0 "$(cat /tmp/r3q2.pid)" 2>/dev/null; do sleep 30; done
fi

run() { # name, timeout_s, env..., -- cmd...
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

run 25_fused_qkv 2400 LINTRANSUNET_PAIRED=1 LINTRANSUNET_FUSED_QKV=1 -- python bench.py --runs 4
run 26_trace_b2 3600 LINTRANSUNET_PAIRED=1 -- python experiments/profile_xplane.py --batch 2
run 27_sw2_split_postfix 2400 LINTRANSUNET_PAIRED=1 LINTRANSUNET_SCAN_SPLIT=1 -- python bench.py --sw_batch 2 --runs 4

echo "QUEUE3 DONE $(date)" | tee -a $R/results.log
