#!/bin/bash
# Round-4 queue 5: the revised fused canvas kernel (prefetch double-buffered
# DMA + K-extended single-dot taps).
#
#   17: inner-strategy probe incl. the new kext/kext_s variants
#   18: conv chain probe — revised kernel vs XLA at L0/L1 geometries
set -u
cd /root/repo
mkdir -p /tmp/r4q5
R=/tmp/r4q5

if [ -f /tmp/r4q4.pid ]; then
  while kill -0 "$(cat /tmp/r4q4.pid)" 2>/dev/null; do sleep 30; done
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

run 17_inner_probe 1800 -- python experiments/pallas_inner_probe.py 3000 12 dots27 kext kext_s chunk272
run 18_conv_probe  2400 -- python experiments/pallas_conv_probe.py 26 13

echo "QUEUE5 DONE $(date)" | tee -a $R/results.log
