#!/bin/bash
# Round-3 serial TPU A/B queue. One job at a time (axon rules: concurrent
# jobs corrupt timings and starve the ~1-core host). Each step is bounded;
# failures don't stop the queue. Results land in /tmp/r3q/.
#
# A/Bs ride the FULL headline bench (not chain microbenches): round 2/3
# showed standalone wins routinely vanish or invert inside the real
# forward's fusion context (docs/DESIGN.md §10), so the shipping metric is
# the only decider for default flips.
set -u
cd /root/repo
mkdir -p /tmp/r3q
R=/tmp/r3q

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

# 0. sanity: tiny matmul through the tunnel (fast-fail if wedged)
run 00_sanity 300 -- python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print(float(jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128)))))"

# 1. shipping default (ruling number)
run 01_default 2400 -- python bench.py --runs 4

# 2. scan-barrier A/B (the ~8 ms in-scan tax)
run 02_barrier_in   2400 LINTRANSUNET_SCAN_BARRIER=in   -- python bench.py --runs 4
run 03_barrier_pred 2400 LINTRANSUNET_SCAN_BARRIER=pred -- python bench.py --runs 4
run 04_barrier_both 2400 LINTRANSUNET_SCAN_BARRIER=both -- python bench.py --runs 4

# 3. paired (8C depth-pair) layout for L0
run 05_paired 2400 LINTRANSUNET_PAIRED=1 -- python bench.py --runs 4

# 3b. split forward/blend scans (canvas out of the predictor's fusion scope)
run 05b_scansplit 2400 LINTRANSUNET_SCAN_SPLIT=1 -- python bench.py --runs 4

# 4. sheared formulation (16/9x FLOPs) on the folded layout:
#    global, and gated to the compute-bound narrow levels only
run 06_sheared   2400 LINTRANSUNET_FOLDED_S1=sheared   -- python bench.py --runs 4
run 06b_sheared64 2400 LINTRANSUNET_FOLDED_S1=sheared64 -- python bench.py --runs 4
# ... and composed with the paired layout (K=N=128 at 16/9x FLOPs on L0)
run 06c_sheared_paired 2400 LINTRANSUNET_FOLDED_S1=sheared64 LINTRANSUNET_PAIRED=1 -- python bench.py --runs 4

# 5. per-window forward cost vs window batch (runner-vs-model attribution)
run 07_swprobe 3000 -- python experiments/sw_batch_probe.py

# 5b. L0/L1 conv chain diagnostics: folded/paired/sheared/sheared+paired
run 07b_chains 3000 -- python experiments/paired_chain_bench.py

# 6. reference geometries: inference-CLI window (512x512x32, sw 4) + eval sw 2
run 08_roi32_sw4 2400 -- python bench.py --roi_depth 32 --sw_batch 4 --runs 4
run 09_sw2       2400 -- python bench.py --sw_batch 2 --runs 4
# … and whether the split scan is what fixes batched windows
run 08b_roi32_sw4_split 2400 LINTRANSUNET_SCAN_SPLIT=1 -- python bench.py --roi_depth 32 --sw_batch 4 --runs 4
run 09b_sw2_split       2400 LINTRANSUNET_SCAN_SPLIT=1 -- python bench.py --sw_batch 2 --runs 4

# 7. training step (the round-1 431 ms/step budget, post round-2/3 fixes)
run 10_train 3600 -- python bench.py --train --runs 5

# 8. train-step scaling: remat alone, then batch>1 (needs remat headroom?)
run 11_train_remat 3600 LINTRANSUNET_REMAT=attn -- python bench.py --train --runs 5
run 12_train_b2       3600 -- python bench.py --train --train_batch 2 --runs 5
run 13_train_b2_remat 3600 LINTRANSUNET_REMAT=attn -- python bench.py --train --train_batch 2 --runs 5
run 14_train_b4_remat 3600 LINTRANSUNET_REMAT=attn -- python bench.py --train --train_batch 4 --runs 5

# 8b. training with the sheared formulation (backward through the 2x2-tap
#     transpose conv; exactness covered by the CPU parity/equiv tests)
run 14b_train_sheared 3600 LINTRANSUNET_FOLDED_S1=sheared64 -- python bench.py --train --runs 5

# 9. xplane trace of the training step (stage attribution for the next move)
run 15_train_trace 3600 -- python experiments/profile_xplane.py --train

echo "QUEUE DONE $(date)" | tee -a $R/results.log
