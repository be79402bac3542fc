#!/usr/bin/env python
"""Generate PARITY_RUNS.md from the run artifacts in runs/ — the tables
are byte-derived from the JSONs (round-2 verdict item 6: a hand-transcribed
table said 0.160 where runs/parity/summary.json records 0.134).

Usage: python tools/gen_parity_md.py [--out PARITY_RUNS.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

R2 = "runs/parity"
R3 = "runs/parity_r3"


def _load(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _fmt(x, nd=3):
    return f"{x:.{nd}f}" if isinstance(x, (int, float)) else str(x)


def _mean_spread(vals):
    import numpy as np
    v = np.asarray(vals, float)
    if v.size == 0:
        return "—"
    if v.size == 1:
        return f"{v[0]:.3f}"
    return f"{v.mean():.3f} ± {v.std(ddof=0):.3f} ({v.min():.3f}–{v.max():.3f})"


def round2_section(lines):
    s = _load(os.path.join(R2, "summary.json"))
    b = _load(os.path.join(R2, "parity_b.json"))
    if not s:
        return
    lines += [
        "## Round-2 runs (48 source stills, 12-image / 15-pair test split)",
        "",
        "Historical record — superseded by the round-3 experiment below. "
        "Two systematic asymmetries were later found in THIS harness "
        "version and fixed for round 3 (see `tools/parity_run.py::lr_at`): "
        "the reference arm decayed its lr once at a hardcoded step 180 "
        "while our arm decayed repeatedly on the real 48-step epochs "
        "(x0.01 by step 480 — the 0.164 plateau below is that), and our "
        "arm trained on TPU at the default bf16-ish matmul precision "
        "while the reference arm ran full fp32.",
        "",
        "### Stage A — detection mAP@0.5 (`runs/parity/summary.json`)",
        "",
        "| Arm / recipe | step: mAP |",
        "|---|---|",
    ]
    for arm, pts in s.get("stage_a_mAP", {}).items():
        cells = ", ".join(f"{k}: {_fmt(v)}" for k, v in
                          sorted(pts.items(), key=lambda kv: int(kv[0])))
        lines.append(f"| {arm} | {cells} |")
    lines += ["",
              "### Stage B — predicate metrics on held-out GT pairs "
              "(`runs/parity/parity_b.json`)", "",
              "| Arm | steps | top-1 | pred mAP | n pairs |", "|---|---|---|---|---|"]
    for arm in ("ours", "ref"):
        m = b.get(f"{arm}_sgg", {})
        if m:
            steps = {"ours": 600, "ref": 300}[arm]   # recorded run lengths
            lines.append(f"| {arm} | {steps} | {_fmt(m['top1_acc'])} | "
                         f"{_fmt(m['pred_mAP'])} | {m['n_pairs']} |")
    lines.append("")


def _seed_rows(data, prefix):
    """{seed: payload} for keys like '<prefix>_s<seed>'."""
    out = {}
    for k, v in data.items():
        if k.startswith(prefix + "_s") and k[len(prefix) + 2:].isdigit():
            out[int(k[len(prefix) + 2:])] = v
    return dict(sorted(out.items()))


def round3_section(lines):
    a = _load(os.path.join(R3, "parity_a.json"))
    b = _load(os.path.join(R3, "parity_b.json"))
    c = _load(os.path.join(R3, "parity_c.json"))
    if not (a or b or c):
        return
    meta = _load(os.path.join(R3, "setup.json"))
    lines += ["## Round-3 experiment (statistical power + fixed schedule)",
              ""]
    if meta:
        lines += [meta.get("description", ""), ""]
    if a:
        lines += ["### Stage A — detection mAP@0.5 per checkpoint step", ""]
        for ds in ("MVRD", "MVidVRD"):
            dom = "source" if ds == "MVRD" else "target (video frames)"
            lines += [f"**{ds} test split ({dom}):**", "",
                      "| Arm | seed | step: mAP |", "|---|---|---|"]
            for arm in ("ours", "ref"):
                for seed, v in _seed_rows(a, arm).items():
                    if not v.get("mAP"):
                        lines.append(f"| {arm} | {seed} | "
                                     f"(trained, eval pending) |")
                        continue
                    cells = ", ".join(
                        f"{s}: {_fmt(m[ds] if isinstance(m, dict) else m)}"
                        for s, m in sorted(v["mAP"].items(),
                                           key=lambda kv: int(kv[0])))
                    lines.append(f"| {arm} | {seed} | {cells} |")
            # final-step mean ± spread
            for arm in ("ours", "ref"):
                rows = _seed_rows(a, arm)
                finals = []
                for v in rows.values():
                    if not v.get("mAP"):
                        continue
                    last = max(v["mAP"], key=int)
                    m = v["mAP"][last]
                    finals.append(m[ds] if isinstance(m, dict) else m)
                if finals:
                    lines.append(f"| {arm} | mean(final) | "
                                 f"{_mean_spread(finals)} |")
            lines.append("")
    pre_rpn = _seed_rows(a, "ours_prerpnfix")
    if pre_rpn:
        lines += [
            "**Archived: ours Stage-A arms BEFORE the RPN detach fix** "
            "(the RCNN regression targets `encode_boxes(rois, gt)/STDS` "
            "backpropagated into the RPN box head — the reference detaches "
            "both RPN outputs before proposal generation, "
            "`lib/model/rpn/rpn.py:77`; ours now stop-gradients at the "
            "same point, `i2vsgg_tpu/models/faster_rcnn.py::_proposals`. "
            "grad_parity.py measured the leaked gradient at cos 0.10 / "
            "~10x the reference norm on `rpn/bbox_pred`; post-fix 283/284 "
            "params match at cos > 0.999 — see PARITY.md):", "",
            "| seed | step: mAP (MVRD / MVidVRD) |", "|---|---|"]
        for seed, v in pre_rpn.items():
            cells = ", ".join(
                f"{s}: {_fmt(m['MVRD'])}/{_fmt(m['MVidVRD'])}"
                for s, m in sorted(v.get("mAP", {}).items(),
                                   key=lambda kv: int(kv[0])))
            lines.append(f"| {seed} | {cells} |")
        lines.append("")
    pre = _seed_rows(a, "ours_preclip")
    if pre:
        lines += [
            "**Archived: ours Stage-A arms BEFORE the clip-norm scope fix** "
            "(the global gradient-clip norm wrongly included frozen "
            "conv1/bn1 gradients, shrinking every clipped step vs the "
            "reference — `i2vsgg_tpu/train/optim.py::sgd_reference`):", "",
            "| seed | step: mAP (MVRD / MVidVRD) |", "|---|---|"]
        for seed, v in pre.items():
            cells = ", ".join(
                f"{s}: {_fmt(m['MVRD'])}/{_fmt(m['MVidVRD'])}"
                for s, m in sorted(v.get("mAP", {}).items(),
                                   key=lambda kv: int(kv[0])))
            lines.append(f"| {seed} | {cells} |")
        lines.append("")
    if b:
        lines += ["### Stage B — predicate metrics on held-out GT pairs",
                  "", "| Arm | seed | top-1 | pred mAP | n pairs |",
                  "|---|---|---|---|---|"]
        for arm in ("ours", "ref"):
            rows = _seed_rows(b, arm + "_sgg")
            for seed, m in rows.items():
                lines.append(f"| {arm} | {seed} | {_fmt(m['top1_acc'])} | "
                             f"{_fmt(m['pred_mAP'])} | {m['n_pairs']} |")
            if rows:
                lines.append(
                    f"| {arm} | mean | "
                    f"{_mean_spread([m['top1_acc'] for m in rows.values()])}"
                    f" | "
                    f"{_mean_spread([m['pred_mAP'] for m in rows.values()])}"
                    f" | |")
        lines.append("")
    if c:
        lines += ["### Stage C — TRAINED video relation detection "
                  "(GT-box pairs -> association -> vIoU@0.5)", "",
                  "| Arm | seed | rel mAP | R@50 | R@100 | P@1 | P@5 | "
                  "P@10 |", "|---|---|---|---|---|---|---|---|"]
        for arm in ("ours", "ref"):
            rows = _seed_rows(c, arm + "_video")
            for seed, m in rows.items():
                lines.append(
                    f"| {arm} | {seed} | {_fmt(m['rel_mAP'])} | "
                    f"{_fmt(m['R@50'])} | {_fmt(m['R@100'])} | "
                    f"{_fmt(m['P@1'])} | {_fmt(m['P@5'])} | "
                    f"{_fmt(m['P@10'])} |")
            if rows:
                cells = " | ".join(
                    _mean_spread([m[k] for m in rows.values()])
                    for k in ("rel_mAP", "R@50", "R@100", "P@1", "P@5",
                              "P@10"))
                lines.append(f"| {arm} | mean | {cells} |")
        lines.append("")
    _pre_bfix_section(lines)
    _round4_sections(lines)


def _round4_sections(lines):
    """Round-4 artifacts: de-saturated Stage C, int8 quality gate,
    converged-checkpoint capacity sweep. Byte-derived like everything
    else here."""
    hard = _load("runs/parity_r4c/stage_c_hard.json")
    if hard.get("ours_hard") or hard.get("ref_hard"):
        lines += [
            "### Stage C on HARD videos (de-saturated R@50)", "",
            f"Regenerated video test set ({hard.get('n_videos', '?')} "
            f"videos, **{hard.get('n_gt_hard', '?')} GT relation "
            "instances** vs 32 in the round-3 set, 4-6 objects/video with "
            "same-class ambiguity + fast motion) so the per-video top-50 "
            "cut binds. Both arms are the TRAINED Stage-B heads "
            "(recipe/training data unchanged — only the eval videos are "
            "hard). `runs/parity_r4c/stage_c_hard.json`.", "",
            "| Arm | rel mAP | R@50 | R@100 | P@1 | P@5 | P@10 |",
            "|---|---|---|---|---|---|---|"]
        for arm in ("ours", "ref"):
            m = hard.get(f"{arm}_hard")
            if m:
                lines.append(
                    f"| {arm} | {_fmt(m['rel_mAP'])} | {_fmt(m['R@50'])} | "
                    f"{_fmt(m['R@100'])} | {_fmt(m['P@1'])} | "
                    f"{_fmt(m['P@5'])} | {_fmt(m['P@10'])} |")
        lines.append("")
    q = _load("runs/quant_ab/quant_ab.json")
    if q.get("fp32") and q.get("int8"):
        lines += [
            "### int8 fc6/fc7 serving quantization — quality gate", "",
            f"Same trained Stage-B checkpoint (`{q.get('ckpt', '?')}`) "
            "evaluated with fp32 vs DenseInt8 fc towers "
            "(`tools/quant_ab.py`, `runs/quant_ab/quant_ab.json`):", "",
            "| Arm | top-1 | pred mAP |", "|---|---|---|"]
        for arm in ("fp32", "int8"):
            m = q[arm]
            lines.append(f"| {arm} | {_fmt(m['top1_acc'])} | "
                         f"{_fmt(m['pred_mAP'])} |")
        d = q.get("delta", {})
        if d:
            lines.append(
                f"| delta | {_fmt(d.get('top1_acc', 0.0))} | "
                f"{_fmt(d.get('pred_mAP', 0.0))} |")
        lines.append("")
    cap = _load("runs/capacity_ab_r4/capacity_ab.json")
    if cap.get("results"):
        lines += [
            "### Serving-capacity quality sweep on a CONVERGED checkpoint",
            "",
            f"Detection mAP per serving capacity config on "
            f"`{cap.get('ckpt_dir', '?')}/{cap.get('step', '?')}` "
            "(round-3's sweep used a degenerate from-scratch model — "
            "advisor finding; `runs/capacity_ab_r4/capacity_ab.json`):",
            "", "| pre-NMS | RPN top-N | max det | mAP |",
            "|---|---|---|---|"]
        for key, m in cap["results"].items():
            pre, rpn, det = (p[3:] for p in key.split("_"))
            lines.append(f"| {pre} | {rpn} | {det} | {_fmt(m['mAP'], 4)} |")
        lines.append("")
    # the determinism-baseline citation is pinned to the r64 artifact —
    # the committed 0.2843410029065319 lives THERE regardless of which
    # section is being rendered (advisor r4: the shared body previously
    # credited it to whichever path was current)
    det_note = ("re-evaluated after the checkpoint GC+deterministic "
                "retrain (PARITY.md round-4 postmortem). The "
                "full-capacity base row doubles as the determinism check "
                "— it must bit-reproduce the value committed in "
                "`runs/capacity_ab_r64/capacity_ab.json` "
                "(0.2843410029065319):")
    r101_note = ("— a FRESH res101-form arm (tools/train_gate_arm.py; "
                 "no retrain-determinism claim), evaluated at the "
                 "parity 240-scale config. Architecture matches the "
                 "bench/serving program (round-4 verdict item 2):")
    for path, title, note in (
            ("runs/capacity_ab_r64/capacity_ab.json",
             "rpn64/pre512 serving-capacity re-gate "
             "(retrained converged ckpt)", det_note),
            ("runs/capacity_ab_r64b/capacity_ab.json",
             "rpn32/48 serving-capacity gate rows "
             "(bench auto-lever candidates, smallest PASSing row wins)",
             det_note),
            ("runs/capacity_ab_r101/capacity_ab.json",
             "res101 serving-capacity gate rows "
             "(matching-architecture arm, smallest PASSing row wins)",
             r101_note),
            ("runs/capacity_ab_r101_600/capacity_ab.json",
             "res101@600 serving-capacity gate rows "
             "(scale- AND architecture-matched arm)",
             "— a FRESH res101 arm trained at the bench's own 600-px "
             "serving scale (tools/train_gate_arm.py --profile "
             "bench600; cfgs/res101.yml anchors). The gate rows are "
             "evaluated at the exact scale the headline serves:")):
        cap64 = _load(path)
        if not cap64.get("results"):
            continue
        lines += [
            f"### {title}", "",
            f"`{cap64.get('ckpt_dir', '?')}/{cap64.get('step', '?')}` "
            f"{note}", "",
            "| pre-NMS | RPN top-N | max det | mAP |", "|---|---|---|---|"]
        for key, m in cap64["results"].items():
            pre, rpn, det = (p[3:] for p in key.split("_")[:3])
            lines.append(f"| {pre} | {rpn} | {det} | {_fmt(m['mAP'], 4)} |")
        lines.append("")
    _int8_trunk_section(lines)


def _int8_trunk_section(lines, tol=0.01):
    """One row per int8-trunk scope A/B artifact (the gate family
    bench.py's _gate_int8trunk ranks — full trunk FAILED, layer scopes
    and @3x3/static variants re-gated in sibling files)."""
    import glob
    files = sorted(glob.glob("runs/quant_trunk_ab/quant_trunk*.json"))
    rows = []
    for p in files:
        d = _load(p)
        delta = d.get("delta")
        if not delta:
            continue
        ok = all(v >= -tol for v in delta.values())
        rows.append((d.get("mode", "sim"),
                     "static" if d.get("act_scales") else "dynamic",
                     delta, "PASS" if ok else "FAIL"))
    if not rows:
        return
    lines += [
        "### int8 trunk-conv serving quantization — scope gate family", "",
        "Same converged Stage-A checkpoint evaluated fp vs int8 trunk "
        "convs per quantization scope (`tools/quant_trunk_ab.py`, "
        "`runs/quant_trunk_ab/*.json`; tol 0.01 mAP on every dataset — "
        "bench.py auto-cashes the best-ranked PASSing scope):", "",
        "| scope (mode) | act scales | " + " | ".join(
            f"d mAP {k}" for k in rows[0][2]) + " | gate |",
        "|---|---|" + "---|" * (len(rows[0][2]) + 1)]
    for mode, acts, delta, verdict in rows:
        lines.append(f"| `{mode}` | {acts} | " + " | ".join(
            f"{v:+.4f}" for v in delta.values()) + f" | {verdict} |")
    lines.append("")


def _pre_bfix_section(lines):
    b = _load(os.path.join(R3, "pre_bfix", "parity_b.json"))
    c = _load(os.path.join(R3, "pre_bfix", "parity_c.json"))
    if not (b or c):
        return
    lines += [
        "**Archived: Stage-B/C arms BEFORE the vrd-recipe alignment** "
        "(the harness's reference arm ran constant lr / no weight decay / "
        "no bias split while ours decayed x0.9 per 36-step epoch with "
        "decay-on-everything, and ours burned schedule steps on pair-less "
        "images the reference arm skips — all fixed in "
        "`tools/parity_run.py::train_reference_sgg` / "
        "`tools/trainval_sgg.py`):", "",
        "| Arm | seed | B top-1 | B pred mAP | C rel mAP | C R@50 |",
        "|---|---|---|---|---|---|"]
    for arm in ("ours", "ref"):
        rows_b = _seed_rows(b, arm + "_sgg")
        rows_c = _seed_rows(c, arm + "_video")
        for seed in rows_b:
            mb = rows_b[seed]
            mc = rows_c.get(seed, {})
            lines.append(
                f"| {arm} | {seed} | {_fmt(mb['top1_acc'])} | "
                f"{_fmt(mb['pred_mAP'])} | "
                f"{_fmt(mc.get('rel_mAP', '—'))} | "
                f"{_fmt(mc.get('R@50', '—'))} |")
    lines.append("")


HEADER = """\
# PARITY_RUNS — trained-quality comparison vs the PyTorch reference

GENERATED by `tools/gen_parity_md.py` from `runs/*/parity_*.json` — do not
hand-edit numbers here; regenerate instead.

Real VRD/VidVRD and the reference's released checkpoints are unobtainable
in this environment (zero egress), so both frameworks train on the SAME
learnable synthetic dataset under the SAME recipe (shared random init via
the value-parity-tested jwyang weight map, shared data order, shared
step-anchored lr schedule, fp32 both arms) and every checkpoint of BOTH
arms is evaluated by OUR eval drivers. Harness: `tools/parity_run.py`;
value-level parity of the two model stacks is separately established by
`tests/test_parity_reference.py` (see PARITY.md).
"""


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_RUNS.md")
    args = ap.parse_args(argv)
    lines = [HEADER]
    round3_section(lines)
    round2_section(lines)
    with open(args.out, "w") as f:
        f.write("\n".join(lines).rstrip() + "\n")
    print(f"wrote {args.out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
