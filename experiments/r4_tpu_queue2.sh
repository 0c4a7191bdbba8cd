#!/bin/bash
# Round-4 queue 2: measure the eval mask-head lightening + full-name trace.
#
#   08: default bench with the light-foreground eval path (commit 3eb38d7);
#       queue-1 job 01 (pre-change, same session-ish) was 230.2
#   09: eval trace with the improved profiler (240-char op names + a
#       full-name copy listing) — the round-4 layout-attack map
#   10: clean-window train bench re-measure (job 04's 261.4 was contaminated
#       by concurrent pytest on the host; queue-5 measured 244.6)
set -u
cd /root/repo
mkdir -p /tmp/r4q2
R=/tmp/r4q2

if [ -f /tmp/r4q1.pid ]; then
  while kill -0 "$(cat /tmp/r4q1.pid)" 2>/dev/null; do sleep 30; done
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

run 08_default_light 2400 -- python bench.py --runs 4
run 09_trace_eval    2400 -- python experiments/profile_xplane.py --top 60
run 10_train_clean   3600 -- python bench.py --train --runs 5

echo "QUEUE2 DONE $(date)" | tee -a $R/results.log
