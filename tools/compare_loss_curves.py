#!/usr/bin/env python
"""Per-component loss-trajectory comparison between parity arms.

Reads the metrics.jsonl of two training sessions (our driver writes one
per run; tools/parity_run.py's reference arm writes a schema-compatible
one since round 3) and prints step-aligned per-component means over
windows — the bisection tool for a residual Stage-A quality gap: a
component whose trajectory diverges early names the subsystem
(RPN sampling vs rcnn head vs adversarial terms).

Usage:
  python tools/compare_loss_curves.py \
      runs/parity_r3/res50/MVRD/session_902/logs/metrics.jsonl \
      runs/parity_r3/res50/MVRD/session_ref1/logs/metrics.jsonl \
      [--window 48]
"""

from __future__ import annotations

import argparse
import json

KEYS = ("loss", "loss_rpn_cls", "loss_rpn_box", "loss_rcnn_cls",
        "loss_rcnn_box", "dloss_s_p", "dloss_t_p", "dloss_s_style",
        "dloss_t_style")


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def window_means(rows, window):
    out = {}
    for r in rows:
        w = int(r.get("step", len(out) * window)) // window
        out.setdefault(w, []).append(r)
    means = {}
    for w, rs in sorted(out.items()):
        means[w] = {k: sum(float(r[k]) for r in rs if k in r)
                    / max(sum(1 for r in rs if k in r), 1) for k in KEYS}
    return means


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("ref")
    ap.add_argument("--window", type=int, default=48)
    args = ap.parse_args(argv)
    a = window_means(load(args.ours), args.window)
    b = window_means(load(args.ref), args.window)
    shared = sorted(set(a) & set(b))
    if not shared:
        print("no overlapping step windows")
        return
    print(f"{'win':>4} " + " ".join(f"{k.replace('loss_',''):>18}"
                                    for k in KEYS))
    for w in shared:
        cells = []
        for k in KEYS:
            cells.append(f"{a[w][k]:8.4f}/{b[w][k]:<8.4f}")
        print(f"{w:>4} " + " ".join(f"{c:>18}" for c in cells))
    print("\ncells are ours/ref window means; flag components where the "
          "two arms' trajectories separate earliest")


if __name__ == "__main__":
    main()
