#!/usr/bin/env python
"""One-session perf cash-in: measure every implemented serving lever.

Round 3/4 left several perf levers implemented, exactness-tested, and
quality-gated — but unmeasured, because the axon TPU tunnel died mid
round 3 and never came back (PERF.md "Not attempted"). The moment a live
chip exists again, the measurements must all land in ONE session (remote
compiles are slow and the tunnel has died twice). This tool runs bench.py
once per lever arm, pairs each fps number with its quality-gate artifact,
and writes a single JSON so the ship/close decision per lever is one look.

Arms (each a bench.py invocation; bench.py's own probe aborts the sweep
cleanly if the tunnel is down):
  base            current default (b16, rpn128/pre1024, det16, bf16 params)
  int8_fc6        DenseInt8 fc6/fc7 towers      gate: runs/quant_ab/quant_ab.json
  det8            --max-det 8 (pairs 240->56)   gate: runs/capacity_ab_r4 det8 rows
  int8_det8       both                          gate: both
  pallas_btl      fused bottleneck-chain kernel (round-3 tie — confirm/close)

Usage:
  python tools/bench_sweep.py [--steps 20] [--json runs/bench_sweep/sweep.json]
  python tools/bench_sweep.py --arms base,int8_fc6,det8,int8_det8

The reference frames its serving budget by its 100-tuple cap
(/root/reference/lib/utils.py:599-627); det8's 56 pairs stays under it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ARMS = {
    "base": [],
    "int8_fc6": ["--int8-fc6"],
    "det8": ["--max-det", "8"],
    "int8_det8": ["--int8-fc6", "--max-det", "8"],
    "pallas_btl": ["--pallas-bottleneck"],
    "int8_trunk": ["--int8-trunk"],
    "int8_all": ["--int8-trunk", "--int8-fc6", "--max-det", "8"],
    "b32": ["--batch", "32"],   # next rung of the b8->b16 +6.5% ladder
}

GATES = {
    "int8_fc6": "runs/quant_ab/quant_ab.json",
    "det8": "runs/capacity_ab_r4/capacity_ab.json",
    "int8_det8": "runs/quant_ab/quant_ab.json+runs/capacity_ab_r4/capacity_ab.json",
    "int8_trunk": "runs/quant_trunk_ab/quant_trunk_ab.json",
    "int8_all": "runs/quant_ab/quant_ab.json+runs/capacity_ab_r4/capacity_ab.json+runs/quant_trunk_ab/quant_trunk_ab.json",
}


def read_gate(path):
    """Summarize a quality-gate artifact (missing file -> 'no gate run')."""
    outs = []
    for p in path.split("+"):
        if not os.path.exists(p):
            outs.append(f"{p}: NOT RUN")
            continue
        try:
            with open(p) as f:
                outs.append(f"{p}: {json.dumps(json.load(f))[:400]}")
        except Exception as e:  # keep sweeping; the gate doc is advisory
            outs.append(f"{p}: unreadable ({e})")
    return " | ".join(outs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json", default="runs/bench_sweep/sweep.json")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra bench.py args applied to every arm")
    args = ap.parse_args(argv)

    root = os.path.join(os.path.dirname(__file__), "..")
    results = []
    for arm in args.arms.split(","):
        arm = arm.strip()
        if arm not in ARMS:
            print(f"unknown arm {arm!r}; known: {list(ARMS)}", file=sys.stderr)
            return 2
        # --no-auto-levers: each arm must measure EXACTLY its config
        # (bench.py's bare-invocation default is to cash in gated levers)
        cmd = [sys.executable, "bench.py", "--steps", str(args.steps),
               "--no-auto-levers", *ARMS[arm], *args.extra]
        print(f"=== {arm}: {' '.join(cmd)}", file=sys.stderr, flush=True)
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True)
        line = (proc.stdout.strip().splitlines() or [""])[-1]
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            row = {"error": f"bench.py rc={proc.returncode}: "
                            f"{proc.stderr.strip()[-400:]}"}
        row["arm"] = arm
        row["wall_s"] = round(time.time() - t0, 1)
        if arm in GATES:
            row["quality_gate"] = read_gate(GATES[arm])
        results.append(row)
        print(json.dumps(row), flush=True)
        if row.get("error") and "tunnel unavailable" in str(row["error"]):
            print("tunnel down -> aborting sweep", file=sys.stderr)
            break

    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump({"arms": results}, f, indent=1)
    print(f"wrote {args.json}", file=sys.stderr)
    ok = [r for r in results if r.get("value")]
    if ok:
        best = max(ok, key=lambda r: r["value"])
        print(json.dumps({"best_arm": best["arm"], "value": best["value"],
                          "unit": best.get("unit")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
