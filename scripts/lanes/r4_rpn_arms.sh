#!/bin/bash
# Perf arms for the rpn64->32/48 serving-capacity lever (PERF.md round-4
# stage dissect: rpn +5.7 ms/32f and det-head +11.6 ms/32f are
# roi-proportional — halving the roi count should clear the 500 north
# star). Runs each candidate at the winning b32 levered host-planes
# config; quality gates run separately (scripts/lanes/retrain_ref1.sh
# -> runs/capacity_ab_r64b; bench.py's _gate_rpn_capacity cashes the
# smallest PASSing row automatically at round end).
set -u
cd "$(dirname "$0")/../.."
OUT=runs/bench_r4e
mkdir -p "$OUT"
LOG="$OUT/rpn_arms.log"
PROBE="scripts/lanes/probe_chip.sh"

arm () {  # arm <name> <rpn_topn> <pre_nms> [extra flags...]
  local name=$1 topn=$2 pre=$3; shift 3
  bash "$PROBE" 7200 >>"$LOG" 2>&1 || { echo "=== $name SKIPPED (chip down) ===" >>"$LOG"; return 1; }
  echo "=== $name $(date -u +%T) ===" >>"$LOG"
  timeout 1800 python bench.py --batch 32 --rpn-topn "$topn" --pre-nms "$pre" \
    --max-det 8 --int8-fc6 --int8-trunk-scope "1:layer3,layer4,@3x3" \
    --int8-static-acts runs/quant_trunk_ab/act_scales_ref1.json \
    --host-planes --no-auto-levers "$@" >>"$LOG" 2>&1
  echo "rc=$? ($name)" >>"$LOG"
  sleep 60
}

arm rpn48_pre384 48 384
arm rpn32_pre256 32 256
# stage splits at the winner candidate: confirm the saving lands where
# the dissect predicted (rpn + det-head lines)
arm rpn32_rpn_stage 32 256 --stage rpn
arm rpn32_det_stage 32 256 --stage det
echo "=== lanes done $(date -u +%T) ===" >>"$LOG"
