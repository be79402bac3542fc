#!/bin/bash
# Round-5 bonus lane: gates at the BENCH's own 600-px serving scale
# (round-4 verdict item 8's deployment-scale arm — architecture AND
# scale matched). Trains a res101 arm on a 600-scale learnable corpus
# ON the chip (tools/train_gate_arm.py --profile bench600: cfgs/
# res101.yml anchors, 160-step epochs, decay x0.1 per epoch boundary
# after epoch 1), then runs the capacity rows + act-scale calibration +
# int8 l234@3x3+static A/B at 600 scale.
set -u
cd "$(dirname "$0")/../.."
OUT=runs/bench600
GOUT=runs/capacity_ab_r101_600
mkdir -p "$GOUT" runs/calib runs/quant_trunk_ab
LOG="$GOUT/lane.log"
export I2VSGG_PARITY_TPU=1

CFG600=(ANCHOR_SCALES "[4, 8, 16]"
        TRAIN.SCALES "[600]" TEST.SCALES "[600]"
        TRAIN.RPN_PRE_NMS_TOP_N 6000
        TRAIN.RPN_POST_NMS_TOP_N 256
        TRAIN.RPN_POST_NMS_TOP_N_TARGET 128
        TEST.RPN_PRE_NMS_TOP_N 6000
        POOLING_MODE align)

STEP=${GATE_STEPS:-320}
CKPT_DIR=$OUT/res101/MVRD/session_902
CKPT=$CKPT_DIR/$STEP
PHYS=$CKPT_DIR/$(printf "step_%08d" "$STEP")

if [ ! -d "$PHYS" ]; then
  echo "=== train res101@600 gate arm ($STEP steps, TPU) $(date -u +%T) ===" >>"$LOG"
  python tools/train_gate_arm.py --out "$OUT" --steps "$STEP" \
    --depth 101 --lr_decay_step 1 --seed 1 --profile bench600 >>"$LOG" 2>&1
  echo "rc=$? (train)" >>"$LOG"
fi
[ -d "$PHYS" ] || { echo "train failed - no $PHYS" >>"$LOG"; exit 1; }
touch "$GOUT/train.done"

echo "=== capacity A/B rows (res101@600, TPU) $(date -u +%T) ===" >>"$LOG"
python tools/capacity_ab.py --out "$GOUT" --net res101 \
  --ckpt "$CKPT" --data "$OUT/data" --dataset MVRD \
  --rows "1024:128:16,256:32:8,384:48:8" \
  --cfg "${CFG600[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (capacity_ab)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/capacity.done"

echo "=== act-scale calibration (res101@600, CPU pass) $(date -u +%T) ===" >>"$LOG"
I2VSGG_PARITY_TPU= python tools/calibrate_act_scales.py --ckpt "$CKPT" \
  --dataset MVRD --net res101 --n_images 32 --bs 2 \
  --json runs/calib/act_scales_res101_600.json \
  --data "$OUT/data" --cfg "${CFG600[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (calibrate)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/calib.done"

if [ -f runs/calib/act_scales_res101_600.json ]; then
  echo "=== int8 trunk A/B l234@3x3+static (res101@600, TPU) $(date -u +%T) ===" >>"$LOG"
  # named to glob-sort BEFORE the 240-scale artifacts: on a rank tie
  # bench._gate_int8trunk keeps the first file, so the served static
  # acts come from the scale-matched calibration
  python tools/quant_trunk_ab.py --out "$OUT" --ckpt "$CKPT" \
    --data "$OUT/data" --net res101 --dataset MVRD --dataset_t MVidVRD \
    --mode "sim:layer2,layer3,layer4,@3x3" \
    --act_scales runs/calib/act_scales_res101_600.json \
    --json runs/quant_trunk_ab/quant_trunk_600scale_l234_k3_static.json \
    --cfg "${CFG600[@]}" >>"$LOG" 2>&1
  rc=$?; echo "rc=$rc (quant_trunk_ab)" >>"$LOG"
  [ $rc -eq 0 ] && touch "$GOUT/quant.done"
fi
echo "=== lane done $(date -u +%T) ===" >>"$LOG"
touch "$GOUT/lane.done"
