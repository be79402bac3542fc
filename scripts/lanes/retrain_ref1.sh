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
# checkpoints live in step_%08d dirs (train/checkpoint.py) — round-4's
# check of the LOGICAL path …/672 (which never exists on disk) declared
# a SUCCESSFUL 2.6h retrain failed and aborted the lane
PHYS=runs/parity_r3/res50/MVRD/session_ref1/step_00000672
rm -f "$OUT/lane.done"
if [ ! -d "$PHYS" ]; then
  echo "=== retrain ref_s1 (672 steps, torch CPU) $(date -u +%T) ===" >>"$LOG"
  python tools/retrain_ref_arm.py --out runs/parity_r3 --steps 672 \
    --seed 1 --snaps 288,480,576 >>"$LOG" 2>&1
  echo "rc=$? (retrain)" >>"$LOG"
fi
[ -d "$PHYS" ] || { echo "retrain failed — no $PHYS" >>"$LOG"; exit 1; }

echo "=== capacity A/B rows $(date -u +%T) ===" >>"$LOG"
python tools/capacity_ab.py --out "$OUT" \
  --ckpt "$CKPT" --data runs/parity_r3/data --dataset MVRD \
  --rows "1024:128:16,256:32:8,384:48:8,512:64:8" \
  --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (capacity_ab)" >>"$LOG"
# terminal marker only on success AND a complete artifact (advisor r4:
# lane.log markers are append-only across attempts and capacity_ab.json
# is written incrementally per row — pollers released on stale/partial
# state). Downstream lanes must key on $OUT/lane.done.
if [ $rc -eq 0 ] && python - <<'EOF'
import json, sys
r = json.load(open("runs/capacity_ab_r64b/capacity_ab.json"))["results"]
need = ["pre1024_rpn128_det16", "pre256_rpn32_det8",
        "pre384_rpn48_det8", "pre512_rpn64_det8"]
sys.exit(0 if all(k in r for k in need) else 1)
EOF
then
  echo "=== lane done $(date -u +%T) ===" >>"$LOG"
  touch "$OUT/lane.done"
else
  echo "=== lane INCOMPLETE (rc=$rc or missing rows) $(date -u +%T) ===" >>"$LOG"
fi
