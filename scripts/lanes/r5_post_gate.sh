#!/bin/bash
# Round-5 post-gate TPU lane: runs AFTER scripts/lanes/r5_res101_gates.sh
# has finished (its rc=0-only terminal marker — advisor r4: never key on
# log lines or incrementally-written JSON). Then rehearses the driver's
# round-end capture: bare `python bench.py`, which must cash the res101
# capacity row + res101 static act scales end to end with a clean tail
# (no "incomplete"/"unit scales" lines — round-4 verdict items 1+2).
set -u
cd "$(dirname "$0")/../.."
OUT=runs/bench_r5
mkdir -p "$OUT"
LOG="$OUT/post_gate.log"
PROBE="scripts/lanes/probe_chip.sh"
GDIR=runs/capacity_ab_r101

echo "=== waiting for $GDIR/lane.done $(date -u +%T) ===" >>"$LOG"
while [ ! -f "$GDIR/lane.done" ]; do sleep 120; done
echo "=== gate lane done $(date -u +%T) ===" >>"$LOG"

# verify the decision-critical rows exist before rehearsing
python - <<'EOF' >>"$LOG" 2>&1
import json
r = json.load(open("runs/capacity_ab_r101/capacity_ab.json"))["results"]
need = ["pre1024_rpn128_det16", "pre256_rpn32_det8", "pre384_rpn48_det8"]
missing = [k for k in need if k not in r]
for k, v in r.items():
    print(f"gate row {k}: mAP {v['mAP']:.4f}")
assert not missing, f"missing rows {missing}"
EOF
[ $? -eq 0 ] || { echo "gate artifact incomplete — aborting" >>"$LOG"; exit 1; }

bash "$PROBE" 7200 >>"$LOG" 2>&1 || { echo "=== rehearsal SKIPPED (chip down) ===" >>"$LOG"; exit 1; }
echo "=== driver-form rehearsal $(date -u +%T) ===" >>"$LOG"
timeout 3600 python bench.py >>"$LOG" 2>&1
echo "rc=$? (driver rehearsal)" >>"$LOG"
echo "=== lane done $(date -u +%T) ===" >>"$LOG"
touch "$OUT/post_gate.done"
