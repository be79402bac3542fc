#!/bin/bash
# Round-5 compile-cache warm lane. The VM reset wiped /tmp/jax_cache, so
# every program shape the driver's round-end `python bench.py` touches
# would compile COLD through the remote-compile tunnel (~3-8 min each)
# and blow the 1500s lever budget before the b128 climb (the headline
# rung). Pre-compile the auto-lever chain's expected shapes (1 step, no
# levers) while the CPU gate lane trains: the rpn32/pre256 levered form
# (the smallest capacity row the r101 gate is expected to cash), its
# batch-doubling ladder, the rpn48 fallback, and the host-planes rung.
# Static-act VALUES don't change program shape (scales are traced args),
# so warming with unit scales covers the calibrated form.
set -u
cd "$(dirname "$0")/../.."
OUT=runs/bench_r5
mkdir -p "$OUT"
LOG="$OUT/warm.log"
PROBE="scripts/lanes/probe_chip.sh"

LEV=(--max-det 8 --int8-fc6 --int8-trunk-scope "1:layer3,layer4,@3x3"
     --int8-static-acts 1)

arm () {  # arm <name> <cmd...>
  local name=$1; shift
  bash "$PROBE" 7200 >>"$LOG" 2>&1 || { echo "=== $name SKIPPED (chip down) ===" >>"$LOG"; return 1; }
  echo "=== warm $name $(date -u +%T) ===" >>"$LOG"
  timeout 1800 "$@" >>"$LOG" 2>&1
  echo "rc=$? ($name)" >>"$LOG"
  sleep 15
}

arm base_b16 python bench.py --steps 1 --warmup 0 --no-auto-levers
arm rpn32_b16 python bench.py --steps 1 --warmup 0 --no-auto-levers \
  --rpn-topn 32 --pre-nms 256 "${LEV[@]}"
arm rpn32_b32 python bench.py --batch 32 --steps 1 --warmup 0 \
  --no-auto-levers --rpn-topn 32 --pre-nms 256 "${LEV[@]}"
arm rpn32_b64 python bench.py --batch 64 --steps 1 --warmup 0 \
  --no-auto-levers --rpn-topn 32 --pre-nms 256 "${LEV[@]}"
arm rpn32_b128 python bench.py --batch 128 --steps 1 --warmup 0 \
  --no-auto-levers --rpn-topn 32 --pre-nms 256 "${LEV[@]}"
arm rpn32_b128_planes python bench.py --batch 128 --steps 1 --warmup 0 \
  --no-auto-levers --rpn-topn 32 --pre-nms 256 --host-planes "${LEV[@]}"
# fallback capacity row in case the rpn32 gate FAILs on the r101 ckpt
arm rpn48_b16 python bench.py --steps 1 --warmup 0 --no-auto-levers \
  --rpn-topn 48 --pre-nms 384 "${LEV[@]}"
echo "=== lane done $(date -u +%T) ===" >>"$LOG"
touch "$OUT/warm.done"
