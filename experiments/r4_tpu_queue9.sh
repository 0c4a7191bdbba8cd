#!/bin/bash
# Round-4 queue 9: post-alias-fix re-tests of refuted knobs whose cost was
# exactly the seams the fixes removed, plus reference-geometry re-measures
# for the BASELINE.md round-4 table.
#
# Fresh trace (2026-08-20, 63.64 ms/window device): the "pads" boundary-tap
# operand materialisation is ~5.7 ms of dual-output kLoop slice fusions
# (fusion.5050-5056) plus the copy.1091/1097 relayouts feeding them —
# PAIRED_S1=3d eliminates those by folding the row taps into the conv; its
# -5% refutation predates the 4D-slice alias fix and S2 changes.
# FUSED_STACK's -9 ms refutation predates the layout-poison diagnosis.
set -u
OUT=/root/repo/experiments/r4q9_results.txt
run() {
  echo "== $1 ==" | tee -a "$OUT"
  local name="$1"; shift
  env "$@" timeout 1500 python /root/repo/bench.py 2>/dev/null | tail -1 | tee -a "$OUT"
}
run "default (session baseline)"
run "PAIRED_S1=3d (re-test post alias fix)" LINTRANSUNET_PAIRED_S1=3d
run "FUSED_STACK=1 (re-test)" LINTRANSUNET_FUSED_STACK=1
echo "== roi32/sw4 reference CLI geometry ==" | tee -a "$OUT"
timeout 1500 python /root/repo/bench.py --roi_depth 32 --sw_batch 4 2>/dev/null | tail -1 | tee -a "$OUT"
echo "== sw2 eval-loop geometry ==" | tee -a "$OUT"
timeout 1500 python /root/repo/bench.py --sw_batch 2 2>/dev/null | tail -1 | tee -a "$OUT"
echo "== train step ==" | tee -a "$OUT"
timeout 1500 python /root/repo/bench.py --train 2>/dev/null | tail -1 | tee -a "$OUT"
echo "== train step batch 3 ==" | tee -a "$OUT"
timeout 2000 python /root/repo/bench.py --train --train_batch 3 2>/dev/null | tail -1 | tee -a "$OUT"
