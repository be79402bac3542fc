#!/bin/bash
# Post-retrain TPU lane: runs AFTER scripts/lanes/retrain_ref1.sh has
# produced runs/capacity_ab_r64b/capacity_ab.json (polls for it so the
# single CPU core stays free for the retrain).
#
# 1. b64 arm at rpn32/pre256: b64 lost at rpn64 (463.2 vs 467.9 —
#    PERF.md round-4 sixth session) plausibly on HBM pressure from the
#    roi tensors; at rpn32 those halve, so re-test the rung.
# 2. Driver-form rehearsal: bare `python bench.py` exactly as the
#    round-end driver runs it — confirms the auto-lever chain (int8 +
#    det8 + rpn-capacity gate + b32 rung + host-planes rung) cashes the
#    new capacity row end to end and lands the >500 headline.
set -u
cd "$(dirname "$0")/../.."
OUT=runs/bench_r4e
mkdir -p "$OUT"
LOG="$OUT/post_gate.log"
PROBE="scripts/lanes/probe_chip.sh"
GATE=runs/capacity_ab_r64b/capacity_ab.json

# capacity_ab.json is written INCREMENTALLY after each row — waiting on
# file existence fires ~25 min early (mid-evals: CPU contention + the
# rehearsal's gate reading a partial artifact). Wait for the retrain
# lane's terminal marker instead.
echo "=== waiting for retrain lane done $(date -u +%T) ===" >>"$LOG"
while ! grep -q "=== lane done" runs/capacity_ab_r64b/lane.log 2>/dev/null
do sleep 180; done
[ -s "$GATE" ] || { echo "retrain lane done but no $GATE — aborting" >>"$LOG"; exit 1; }
echo "=== gate artifact complete $(date -u +%T) ===" >>"$LOG"
python - <<'EOF' >>"$LOG" 2>&1
import json
r = json.load(open("runs/capacity_ab_r64b/capacity_ab.json"))["results"]
for k, v in r.items():
    print(f"gate row {k}: mAP {v['mAP']:.4f}")
EOF

arm () {  # arm <name> <cmd...>
  local name=$1; shift
  bash "$PROBE" 7200 >>"$LOG" 2>&1 || { echo "=== $name SKIPPED (chip down) ===" >>"$LOG"; return 1; }
  echo "=== $name $(date -u +%T) ===" >>"$LOG"
  timeout 2400 "$@" >>"$LOG" 2>&1
  echo "rc=$? ($name)" >>"$LOG"
  sleep 60
}

arm b64_rpn32 python bench.py --batch 64 --rpn-topn 32 --pre-nms 256 \
  --max-det 8 --int8-fc6 --int8-trunk-scope "1:layer3,layer4,@3x3" \
  --int8-static-acts runs/quant_trunk_ab/act_scales_ref1.json \
  --host-planes --no-auto-levers

arm driver_rehearsal python bench.py

echo "=== lane done $(date -u +%T) ===" >>"$LOG"
