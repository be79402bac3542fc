#!/bin/bash
# Round-5 matching-architecture serving gates (verdict r4 items 1+2,
# weakness #2): train ONE res101-form detector on the parity corpus,
# then run every serving-lever quality gate against IT —
#   1. capacity A/B rows (pre1024_rpn128_det16 base + rpn32/rpn48
#      candidates) -> runs/capacity_ab_r101/capacity_ab.json, read by
#      bench.py::_gate_rpn_capacity (smallest PASSing row cashes),
#   2. static act-scale calibration covering ALL res101 blocks ->
#      runs/calib/act_scales_res101.json (kills the round-4 unit-scale
#      fallback: the res50 calibration lacked layer3/block10+),
#   3. int8-trunk l34@3x3+static A/B on both domains ->
#      runs/quant_trunk_ab/quant_trunk_l34_k3_static_res101.json.
# Entirely CPU-bound; ~2.2h train + ~2h evals on the 1-core box.
#
# Terminal markers (advisor r4): stage markers are written ONLY on rc=0,
# to per-attempt files — pollers must key on lane.done / <stage>.done,
# never on log lines or incrementally-written JSON artifacts.
set -u
cd "$(dirname "$0")/../.."
OUT=runs/parity_r5
GOUT=runs/capacity_ab_r101
mkdir -p "$GOUT" runs/calib runs/quant_trunk_ab
LOG="$GOUT/lane.log"
rm -f "$GOUT/lane.done" "$GOUT/train.done" "$GOUT/capacity.done" \
      "$GOUT/calib.done" "$GOUT/quant.done"

# 240-scale parity-campaign overrides (tools/parity_run.py
# CFG_OVERRIDES) — the ckpt trains at this scale/anchors; evaluating at
# the default 600-scale CFG was round-4 postmortem failure mode #2
PARITY_CFG=(ANCHOR_SCALES "[2, 4, 8]"
            TRAIN.SCALES "[240]" TEST.SCALES "[240]"
            TRAIN.RPN_PRE_NMS_TOP_N 3000
            TRAIN.RPN_POST_NMS_TOP_N 256
            TRAIN.RPN_POST_NMS_TOP_N_TARGET 128
            TEST.RPN_PRE_NMS_TOP_N 3000
            TEST.RPN_POST_NMS_TOP_N 128
            POOLING_MODE align)

STEP=${GATE_STEPS:-288}
CKPT_DIR=$OUT/res101/MVRD/session_902
CKPT=$CKPT_DIR/$STEP
# checkpoints live in step_%08d dirs (train/checkpoint.py) — the
# round-4 lane checked the LOGICAL path …/672 which never exists on
# disk, so it declared a successful retrain failed; check the physical
# dir
PHYS=$CKPT_DIR/$(printf "step_%08d" "$STEP")
if [ ! -d "$PHYS" ]; then
  echo "=== train res101 gate arm ($STEP steps) $(date -u +%T) ===" >>"$LOG"
  python tools/train_gate_arm.py --out "$OUT" --steps "$STEP" \
    --depth 101 --lr_decay_step 2 --seed 1 >>"$LOG" 2>&1
  echo "rc=$? (train)" >>"$LOG"
fi
[ -d "$PHYS" ] || { echo "train failed - no $PHYS" >>"$LOG"; exit 1; }
touch "$GOUT/train.done"

echo "=== capacity A/B rows (res101) $(date -u +%T) ===" >>"$LOG"
python tools/capacity_ab.py --out "$GOUT" --net res101 \
  --ckpt "$CKPT" --data "$OUT/data" --dataset MVRD \
  --rows "1024:128:16,256:32:8,384:48:8" \
  --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (capacity_ab)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/capacity.done"

echo "=== act-scale calibration (res101) $(date -u +%T) ===" >>"$LOG"
python tools/calibrate_act_scales.py --ckpt "$CKPT" --dataset MVRD \
  --net res101 --n_images 64 --json runs/calib/act_scales_res101.json \
  --data "$OUT/data" --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (calibrate)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/calib.done"

if [ -f runs/calib/act_scales_res101.json ]; then
  echo "=== int8 trunk A/B l34@3x3+static (res101) $(date -u +%T) ===" >>"$LOG"
  python tools/quant_trunk_ab.py --out "$OUT" --ckpt "$CKPT" \
    --data "$OUT/data" --net res101 --dataset MVRD --dataset_t MVidVRD \
    --mode "sim:layer3,layer4,@3x3" \
    --act_scales runs/calib/act_scales_res101.json \
    --json runs/quant_trunk_ab/quant_trunk_l34_k3_static_res101.json \
    --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
  rc=$?; echo "rc=$rc (quant_trunk_ab)" >>"$LOG"
  [ $rc -eq 0 ] && touch "$GOUT/quant.done"
fi
echo "=== lane done $(date -u +%T) ===" >>"$LOG"
touch "$GOUT/lane.done"
