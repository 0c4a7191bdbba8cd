#!/bin/bash
# Round-3 queue 4: the exec-split reference geometries + winner-combo extras.
#
# Queue-2 verdicts so far: paired+barrier=both 228.4, paired+split 199.1,
# paired+both+split 231.8 (best) — split only pays WITH the barrier.
# Queue-1/2 sw_batch>1 rows (116.7 / 144.8 / 139.9) all predate
# LINTRANSUNET_SW_EXEC=split (commit 581c6d3), which runs each window at
# its native batch; these jobs re-measure the reference geometries with it
# (expected: per-window cost == sw_batch=1).
#
#   28: sw2, paired (exec-split default)          — VERDICT #6 table row
#   29: roi32/sw4, paired (exec-split default)    — VERDICT #6 table row
#   30: roi32/sw1, paired                         — the per-window baseline for 29
#   31: fused-QKV on the winner combo             — queue-3 leftover
#   32: winner-combo trace                        — next-lever map
set -u
cd /root/repo
mkdir -p /tmp/r3q4
R=/tmp/r3q4

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

run 28_sw2_execsplit   2400 LINTRANSUNET_PAIRED=1 -- python bench.py --sw_batch 2 --runs 4
run 29_roi32_sw4_execsplit 2400 LINTRANSUNET_PAIRED=1 -- python bench.py --roi_depth 32 --sw_batch 4 --runs 4
run 30_roi32_sw1       2400 LINTRANSUNET_PAIRED=1 -- python bench.py --roi_depth 32 --runs 4
run 31_fused_qkv_winner 2400 LINTRANSUNET_PAIRED=1 LINTRANSUNET_SCAN_BARRIER=both LINTRANSUNET_SCAN_SPLIT=1 LINTRANSUNET_FUSED_QKV=1 -- python bench.py --runs 4
run 32_trace_winner    3600 LINTRANSUNET_PAIRED=1 LINTRANSUNET_SCAN_BARRIER=both LINTRANSUNET_SCAN_SPLIT=1 -- python experiments/profile_xplane.py

echo "QUEUE4 DONE $(date)" | tee -a $R/results.log
