#!/usr/bin/env python
"""Stage-B predicate-mAP calibration study (round-4 verdict item 4).

Observed (PARITY_RUNS.md Stage B, 672-step campaign): ours' top-1 is
ABOVE the reference band (0.672 vs 0.565) while pred-mAP sits at the
band's bottom (0.460 vs ref mean 0.500, range 0.458-0.549), with 37x
tighter variance. Across the REFERENCE's own seeds top-1 and pred-mAP
ANTI-correlate (seed 2: top-1 0.467 -> mAP 0.549; seed 1: top-1
0.646 -> mAP 0.458): under the protocol's per-pair softmax, a sharper
(better top-1) model redistributes probability mass so per-predicate
CROSS-PAIR rankings — what AP measures — degrade. This tool tests that
mechanism directly: retrain both arms (identical campaign recipe,
seeds, data — torch CPU reference via refshim, ours via the normal
driver) and score the SAME trained heads under several host-side
transforms of the raw cosine logits:

  protocol   softmax(s)            — the parity protocol (sanity: must
                                     reproduce the committed numbers)
  raw        s                     — per-predicate ranking by the
                                     cosine similarity itself (no
                                     per-pair normalization coupling)
  sharp4     softmax(4 s)          — T=0.25
  soprior    softmax(s) + log(.5 (prior[s_cls-1, o_cls-1] + 1/R))
             — the reference's recognition-path fusion form
               [lib/utils.py:570-582] applied to the Stage-B pairs

Per-pair monotone transforms leave top-1 unchanged; only the AP-bearing
cross-pair rankings move. If ours >= ref under `raw` while trailing
under `protocol`, the band position is a property of the softmax
protocol's calibration coupling, not of relation-recognition quality.

Reference behaviors exercised: vrd head training
[trainval_net_SGG_emb.py:129-148 param groups, resnet_SGG_emb.py:64-230
forward], eval softmax [resnet_SGG_emb.py:217-220].
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _softmax(x, t=1.0):
    z = x * t
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def collect(raw_fn):
    """(raw_scores, labels, sub_cls, obj_cls) over the test split's GT
    pairs — the same traversal as parity_run.eval_sgg."""
    from tools import parity_run as pr
    rows = []
    for index, im, scale, boxes, classes, pairs, labels in \
            pr._stage_b_data("test"):
        s = raw_fn(index, im, scale, boxes, pairs)
        for ii, lab in enumerate(labels):
            si, oi = pairs[ii]
            rows.append((np.asarray(s[ii], np.float64),
                         np.asarray(lab, np.float64),
                         int(classes[si]), int(classes[oi])))
    return rows


def metrics(scores_all, labels_all):
    """Top-1 accuracy + per-predicate AP, identical arithmetic to
    parity_run.eval_sgg."""
    from tools.parity_run import N_REL
    correct = sum(1 for s, lab in zip(scores_all, labels_all)
                  if lab[int(np.argmax(s))] > 0)
    scores_all = np.stack(scores_all)
    labels_all = np.stack(labels_all)
    aps = []
    for r in range(N_REL):
        lab = labels_all[:, r]
        if lab.sum() == 0:
            continue
        order = np.argsort(-scores_all[:, r])
        tp = lab[order]
        rec = np.cumsum(tp) / lab.sum()
        prec = np.cumsum(tp) / (np.arange(len(tp)) + 1)
        aps.append(float(np.sum((rec[1:] - rec[:-1]) * prec[1:])
                         + rec[0] * prec[0]))
    return {"top1_acc": correct / max(len(labels_all), 1),
            "pred_mAP": float(np.mean(aps)) if aps else 0.0}


@contextlib.contextmanager
def identity_softmax():
    """Make the reference vrd head return raw cosine logits: its eval
    branch applies F.softmax inside forward [resnet_SGG_emb.py:217-220].
    Scoped to the rescore loop only."""
    import torch.nn.functional as F
    orig = F.softmax
    F.softmax = lambda x, dim=None: x
    try:
        yield
    finally:
        F.softmax = orig


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/stage_b_r5")
    ap.add_argument("--data", default="runs/parity_r5/data",
                    help="parity corpus root (regenerated bit-identically "
                         "when absent)")
    ap.add_argument("--steps", type=int, default=672)
    ap.add_argument("--seeds", default="1")
    ap.add_argument("--arms", default="ours,ref")
    args = ap.parse_args(argv)

    import jax
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "float32")

    from tools import parity_run as pr
    from tools.train_gate_arm import ensure_parity_data
    ensure_parity_data(args.data)
    os.environ["I2VSGG_DATA_ROOT"] = args.data

    import pickle
    with open(os.path.join(args.data, "MVidVRD",
                           "source_so_prior.pkl"), "rb") as f:
        prior = np.asarray(pickle.load(f))          # (15, 15, R)

    def variants(rows):
        raws = [r[0] for r in rows]
        labs = [r[1] for r in rows]
        fused = [_softmax(s[None])[0]
                 + np.log(0.5 * (prior[sc - 1, oc - 1] + 1.0 / len(s)))
                 for s, _, sc, oc in rows]
        return {
            "protocol_softmax": metrics([_softmax(s[None])[0]
                                         for s in raws], labs),
            "raw_cosine": metrics(raws, labs),
            "sharp_T0.25": metrics([_softmax(s[None], 4.0)[0]
                                    for s in raws], labs),
            # flatter per-pair distributions: if pred-mAP RISES while
            # top-1 is unchanged, the protocol metric rewards flatness,
            # completing the monotone sharpness->mAP story
            "flat_T4": metrics([_softmax(s[None], 0.25)[0]
                                for s in raws], labs),
            "soprior_fused": metrics(fused, labs),
        }

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "stage_b_rescore.json")
    results = {}
    if os.path.exists(path):            # accumulate across invocations
        with open(path) as f:
            results = json.load(f)
    for seed in (int(s) for s in args.seeds.split(",")):
        for arm in args.arms.split(","):
            print(f"=== {arm} seed {seed} ===", flush=True)
            if arm == "ours":
                pr.train_ours_sgg(args.data, args.out, args.steps,
                                  seed=seed)
                ckpt_dir = os.path.join(
                    args.out, f"res{pr.HP['depth']}", "MVRD_SGG",
                    f"session_{951 + seed}")
                rows = collect(pr._ours_sgg_score_fn(ckpt_dir, raw=True))
            else:
                score_fn = pr.train_reference_sgg(args.data, args.out,
                                                  args.steps, seed=seed)
                with identity_softmax():
                    rows = collect(score_fn)
            results[f"{arm}_s{seed}"] = variants(rows)
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
            for k, v in results[f"{arm}_s{seed}"].items():
                print(f"  {k}: top1 {v['top1_acc']:.3f} "
                      f"mAP {v['pred_mAP']:.3f}", flush=True)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
