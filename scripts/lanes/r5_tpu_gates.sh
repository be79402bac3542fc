#!/bin/bash
# Round-5 TPU-arm gate lane: the gate checkpoint has NO torch-reference
# twin, so nothing ties it to the CPU — session 903 trains OUR res101
# arm ON THE CHIP (I2VSGG_PARITY_TPU=1, fp32 matmul precision), and this
# lane runs every serving gate against it on the chip too: ~minutes per
# eval pass instead of ~20 min each on the 1-core host. Within-artifact
# consistency is what the gates compare (base row vs candidate rows; fp
# arm vs int8 arm) — every row of an artifact runs on the SAME backend.
#
# Writes the same artifacts/markers as scripts/lanes/r5_res101_gates.sh
# (kill that CPU lane before starting this one — same output paths).
set -u
cd "$(dirname "$0")/../.."
OUT=runs/parity_r5
GOUT=runs/capacity_ab_r101
mkdir -p "$GOUT" runs/calib runs/quant_trunk_ab
LOG="$GOUT/lane_tpu.log"
export I2VSGG_PARITY_TPU=1

PARITY_CFG=(ANCHOR_SCALES "[2, 4, 8]"
            TRAIN.SCALES "[240]" TEST.SCALES "[240]"
            TRAIN.RPN_PRE_NMS_TOP_N 3000
            TRAIN.RPN_POST_NMS_TOP_N 256
            TRAIN.RPN_POST_NMS_TOP_N_TARGET 128
            TEST.RPN_PRE_NMS_TOP_N 3000
            TEST.RPN_POST_NMS_TOP_N 128
            POOLING_MODE align)

STEP=${GATE_STEPS:-288}
CKPT_DIR=$OUT/res101/MVRD/session_903
CKPT=$CKPT_DIR/$STEP
PHYS=$CKPT_DIR/$(printf "step_%08d" "$STEP")

echo "=== waiting for $PHYS $(date -u +%T) ===" >>"$LOG"
while [ ! -d "$PHYS" ]; do sleep 60; done
echo "=== ckpt ready $(date -u +%T) ===" >>"$LOG"

echo "=== capacity A/B rows (res101, TPU) $(date -u +%T) ===" >>"$LOG"
python tools/capacity_ab.py --out "$GOUT" --net res101 \
  --ckpt "$CKPT" --data "$OUT/data" --dataset MVRD \
  --rows "1024:128:16,256:32:8,384:48:8" \
  --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (capacity_ab)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/capacity.done"

echo "=== act-scale calibration (res101, CPU pass) $(date -u +%T) ===" >>"$LOG"
# calibration runs the model EAGERLY (mutable intermediates, no jit) —
# per-op tunnel RPCs on the chip; one 64-image fp pass on the host CPU
# is ~5 min and the scales are calibration constants either way (their
# serving effect is then measured ON the chip by the quant A/B)
I2VSGG_PARITY_TPU= python tools/calibrate_act_scales.py --ckpt "$CKPT" \
  --dataset MVRD \
  --net res101 --n_images 64 --json runs/calib/act_scales_res101.json \
  --data "$OUT/data" --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (calibrate)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/calib.done"

if [ -f runs/calib/act_scales_res101.json ]; then
  echo "=== int8 trunk A/B l34@3x3+static (res101, TPU) $(date -u +%T) ===" >>"$LOG"
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
