#!/bin/bash
# Round-3 follow-up TPU queue: combos of the queue-1 winners.
#
# Queue-1 verdicts (/tmp/r3q/results.log, full-bench basis, runs=4):
#   default 202.1 | barrier=pred 204.3 | barrier=both 204.9 | PAIRED=1 224.3
#   scan_split 207.7 | sheared 171.3 | sheared64 194.4 | sheared64+paired 207.2
# => paired wins big; barrier/split are small additive candidates; sheared
#    loses on-chip (the realign + half-lane boundary taps eat the predicted
#    MXU-rate gain) — stays default off.
#
# This queue decides: do paired+barrier+split compose? what do the
# reference geometries and the training step look like with paired on?
set -u
cd /root/repo
mkdir -p /tmp/r3q2
R=/tmp/r3q2

# Serialise against queue 1 (one TPU job at a time).
if [ -f /tmp/r3q.pid ]; then
  while kill -0 "$(cat /tmp/r3q.pid)" 2>/dev/null; do sleep 30; done
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

run 00_sanity 300 -- python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print(float(jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128)))))"

# 1. combos of the queue-1 winners
run 16_paired_both  2400 LINTRANSUNET_PAIRED=1 LINTRANSUNET_SCAN_BARRIER=both -- python bench.py --runs 4
run 17_paired_split 2400 LINTRANSUNET_PAIRED=1 LINTRANSUNET_SCAN_SPLIT=1      -- python bench.py --runs 4
run 18_paired_both_split 2400 LINTRANSUNET_PAIRED=1 LINTRANSUNET_SCAN_BARRIER=both LINTRANSUNET_SCAN_SPLIT=1 -- python bench.py --runs 4

# 2. reference geometries with paired on (queue-1 08/09 are the baselines)
run 19_roi32_sw4_paired 2400 LINTRANSUNET_PAIRED=1 -- python bench.py --roi_depth 32 --sw_batch 4 --runs 4
run 20_sw2_paired       2400 LINTRANSUNET_PAIRED=1 -- python bench.py --sw_batch 2 --runs 4

# 3. training with paired (backward through fold_pairs; CPU equivalence tested)
run 21_train_paired       3600 LINTRANSUNET_PAIRED=1 -- python bench.py --train --runs 5
run 22_train_paired_remat 3600 LINTRANSUNET_PAIRED=1 LINTRANSUNET_REMAT=attn -- python bench.py --train --runs 5

# 4. chain diagnostics (queue-1 07b crashed on a sys.path bug, fixed)
run 23_chains 3000 -- python experiments/paired_chain_bench.py

# 5. xplane trace of the winner config (the new per-stage map for the
#    next lever after the default flips)
run 24_trace_paired 3600 LINTRANSUNET_PAIRED=1 -- python experiments/profile_xplane.py

echo "QUEUE2 DONE $(date)" | tee -a $R/results.log
