#!/bin/bash
# Rebuild the GC'd converged quality-gate checkpoint and run the
# rpn32/48 capacity A/B rows (the quality gates for the rpn64->32 perf
# lever). Entirely CPU-bound (torch reference arm + XLA:CPU evals) —
# ~2.6 h train + ~45 min evals on the 1-core box; run it AFTER any TPU
# lanes that need the host core.
#
# Row semantics (tools/capacity_ab.py): base row pre1024_rpn128_det16
# first — it must bit-reproduce the committed 0.2843410029065319
# (determinism check, round-4 postmortem), then candidate rows smallest
# capacity first, matching bench.py's _RPN_ROWS order.
set -u
cd "$(dirname "$0")/../.."
OUT=runs/capacity_ab_r64b
mkdir -p "$OUT"
LOG="$OUT/lane.log"

# 240-scale parity-campaign overrides (tools/parity_run.py
# CFG_OVERRIDES) — the ckpt trained at this scale/anchors; evaluating at
# the default 600-scale CFG was round-4 postmortem failure mode #2
PARITY_CFG=(ANCHOR_SCALES "[2, 4, 8]"
            TRAIN.SCALES "[240]" TEST.SCALES "[240]"
            TRAIN.RPN_PRE_NMS_TOP_N 3000
            TRAIN.RPN_POST_NMS_TOP_N 256
            TRAIN.RPN_POST_NMS_TOP_N_TARGET 128
            TEST.RPN_PRE_NMS_TOP_N 3000
            TEST.RPN_POST_NMS_TOP_N 128
            POOLING_MODE align)

CKPT=runs/parity_r3/res50/MVRD/session_ref1/672
if [ ! -d "$CKPT" ]; then
  echo "=== retrain ref_s1 (672 steps, torch CPU) $(date -u +%T) ===" >>"$LOG"
  python tools/retrain_ref_arm.py --out runs/parity_r3 --steps 672 \
    --seed 1 --snaps 288,480,576 >>"$LOG" 2>&1
  echo "rc=$? (retrain)" >>"$LOG"
fi
[ -d "$CKPT" ] || { echo "retrain failed — no $CKPT" >>"$LOG"; exit 1; }

echo "=== capacity A/B rows $(date -u +%T) ===" >>"$LOG"
python tools/capacity_ab.py --out "$OUT" \
  --ckpt "$CKPT" --data runs/parity_r3/data --dataset MVRD \
  --rows "1024:128:16,256:32:8,384:48:8,512:64:8" \
  --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
echo "rc=$? (capacity_ab)" >>"$LOG"
echo "=== lane done $(date -u +%T) ===" >>"$LOG"
