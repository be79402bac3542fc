#!/bin/bash
# Round-5 stretch gate (verdict item 7), TPU-arm variant: extend the
# int8 @3x3+static trunk scope into layer2 and gate it on the SAME
# res101 checkpoint (session 903) and backend (chip) as the l34 gate.
# Waits for the main TPU lane's quant marker; --reuse_fp halves the A/B
# (fp arm is mode-independent, fingerprint-checked). On PASS, bench.py's
# _gate_int8trunk auto-ranks l234 above l34 (more layers, same
# @3x3+static+net) and the auto-lever serves it.
set -u
cd "$(dirname "$0")/../.."
OUT=runs/parity_r5
GOUT=runs/capacity_ab_r101
LOG="$GOUT/l2_gate.log"
export I2VSGG_PARITY_TPU=1

PARITY_CFG=(ANCHOR_SCALES "[2, 4, 8]"
            TRAIN.SCALES "[240]" TEST.SCALES "[240]"
            TRAIN.RPN_PRE_NMS_TOP_N 3000
            TRAIN.RPN_POST_NMS_TOP_N 256
            TRAIN.RPN_POST_NMS_TOP_N_TARGET 128
            TEST.RPN_PRE_NMS_TOP_N 3000
            TEST.RPN_POST_NMS_TOP_N 128
            POOLING_MODE align)

echo "=== waiting for $GOUT/quant.done $(date -u +%T) ===" >>"$LOG"
while [ ! -f "$GOUT/quant.done" ]; do sleep 60; done

STEP=${GATE_STEPS:-288}
CKPT=$OUT/res101/MVRD/session_903/$STEP
echo "=== int8 trunk A/B l234@3x3+static (res101, TPU, reuse fp) $(date -u +%T) ===" >>"$LOG"
python tools/quant_trunk_ab.py --out "$OUT" --ckpt "$CKPT" \
  --data "$OUT/data" --net res101 --dataset MVRD --dataset_t MVidVRD \
  --mode "sim:layer2,layer3,layer4,@3x3" \
  --act_scales runs/calib/act_scales_res101.json \
  --reuse_fp runs/quant_trunk_ab/quant_trunk_l34_k3_static_res101.json \
  --json runs/quant_trunk_ab/quant_trunk_l234_k3_static_res101.json \
  --cfg "${PARITY_CFG[@]}" >>"$LOG" 2>&1
rc=$?; echo "rc=$rc (quant_trunk_ab l234)" >>"$LOG"
[ $rc -eq 0 ] && touch "$GOUT/l2_gate.done"
echo "=== lane done $(date -u +%T) ===" >>"$LOG"
