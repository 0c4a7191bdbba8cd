#!/bin/bash
# Round-4 queue 7: same-session full-bench A/Bs
#  - EVAL_FG=1: fg-only eval epilogue + runner derive_background
#  - NORM_APPLY=affine: bf16 FMA normalise apply (stats stay f32)
#  - PAIRS_PACK=2step: pair-lane -> folded-packed relayout as two transposes
#  - UPBLOCK_DUAL=1 retest post alias-fix (copy.1094 [32,128,128,256] is
#    back in the top-5 copies on the fresh round-4 trace)
# Session baseline (EVAL_FG=0, defaults): 264.28 (bench_manual, 22:38).
# Results -> /root/repo/experiments/r4q7_results.txt (NOT /tmp: wiped
# between sessions). Compiles run ~8 min/config this session -> timeout 1500.
set -u
OUT=/root/repo/experiments/r4q7_results.txt
run() {
  echo "== $1 ==" | tee -a "$OUT"
  shift
  env "$@" timeout 1500 python /root/repo/bench.py 2>/dev/null | tee -a "$OUT"
}
run "EVAL_FG=1" LINTRANSUNET_EVAL_FG=1
run "EVAL_FG=1 + NORM_APPLY=affine" LINTRANSUNET_EVAL_FG=1 LINTRANSUNET_NORM_APPLY=affine
run "NORM_APPLY=affine (FG=0)" LINTRANSUNET_EVAL_FG=0 LINTRANSUNET_NORM_APPLY=affine
run "PAIRS_PACK=2step (FG=0)" LINTRANSUNET_EVAL_FG=0 LINTRANSUNET_PAIRS_PACK=2step
run "UPBLOCK_DUAL=1 (FG=0)" LINTRANSUNET_EVAL_FG=0 LINTRANSUNET_UPBLOCK_DUAL=1
