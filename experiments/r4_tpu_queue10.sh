#!/bin/bash
# Round-4 queue 10: embedded A/B of the dspatial stride-1 formulation.
#
# dspatial_probe.py (v5e, 2026-08-20): L0 3-conv chain 7.25 ms (dspatial,
# plain folded 4C) vs 15.67 (auto/3d folded) vs 9.57 (shipping paired
# pads); L1 4.21 vs taps 4.03. If the isolated L0 win survives embedding,
# PAIRED=0 + dspatial both removes the pair fold/unfold seams AND the
# boundary-operand slice fusions (~5.7 ms/window on the fresh trace).
# Isolated-win/embedded-wash is 9-for-9 — only this full bench decides.
set -u
OUT=/root/repo/experiments/r4q10_results.txt
run() {
  echo "== $1 ==" | tee -a "$OUT"
  shift
  env "$@" timeout 1500 python /root/repo/bench.py 2>/dev/null | tail -1 | tee -a "$OUT"
}
run "default (paired, session baseline)"
run "PAIRED=0 FOLDED_S1=dspatial64" LINTRANSUNET_PAIRED=0 LINTRANSUNET_FOLDED_S1=dspatial64
run "PAIRED=0 FOLDED_S1=dspatial (all levels)" LINTRANSUNET_PAIRED=0 LINTRANSUNET_FOLDED_S1=dspatial
echo "== train: PAIRED=0 FOLDED_S1=dspatial64 ==" | tee -a "$OUT"
env LINTRANSUNET_PAIRED=0 LINTRANSUNET_FOLDED_S1=dspatial64 timeout 1500 python /root/repo/bench.py --train 2>/dev/null | tail -1 | tee -a "$OUT"
