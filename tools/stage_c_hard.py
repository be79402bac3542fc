#!/usr/bin/env python
"""De-saturated Stage-C: trained R@50 on HARD synthetic videos.

Round-3 verdict item 6: the 10-video Stage-C set carried only 32 GT
relation instances, so every arm scored R@50 = 1.000 and the named
north-star metric was demonstrated only vacuously. This tool re-evaluates
both arms' TRAINED relation pipelines on a regenerated hard video set
(4-6 objects/video with same-class ambiguity, smaller boxes, faster
motion -> ~40-80 GT instances/video; ``make_data(hard_videos=True)``) so
the per-video top-50 cut actually binds (R@50 semantics:
/root/reference/lib/utils.py:375-458 — recall of GT trajectories by the
top-50 ranked candidates per video).

Arms:
- ours: scorer rebuilt from a saved Stage-B checkpoint (no retrain).
- ref:  the reference vrd head has no saved checkpoint (the parity
  harness returns an in-memory scorer), so it is RETRAINED on the
  ORIGINAL Stage-B data with the campaign recipe (~40-70 min torch CPU),
  then evaluated on the hard set. The trained state_dict is saved next
  to the results for reuse via --ref_head.

Both arms train on the ORIGINAL data (unchanged recipe); only the
EVAL videos are hard — a test-set swap, not a retrain on new data.

Usage:
  python tools/stage_c_hard.py --out runs/parity_r3 \
      --hard_out runs/parity_r4c --seed 1 \
      --ours_ckpt runs/parity_r3/res50/MVRD_SGG/session_952/672
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r3",
                    help="original parity campaign dir (training data + "
                         "ours Stage-B checkpoints live here)")
    ap.add_argument("--hard_out", default="runs/parity_r4c")
    ap.add_argument("--seed", type=int, default=1,
                    help="ref retrain seed; should match the seed of "
                         "--ours_ckpt's session for a paired comparison")
    ap.add_argument("--ours_ckpt", required=True)
    ap.add_argument("--ref_head", default="",
                    help="reuse a previously saved ref head state_dict "
                         "instead of retraining")
    ap.add_argument("--steps", type=int, default=672)
    ap.add_argument("--n_videos", type=int, default=24)
    ap.add_argument("--arms", default="ours,ref")
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")

    orig_root = os.path.join(args.out, "data")
    hard_root = os.path.join(args.hard_out, "data")
    os.environ["I2VSGG_DATA_ROOT"] = orig_root

    from tools.parity_run import make_data, eval_video_rel
    from tools.quant_ab import build_scorer

    if not os.path.isdir(os.path.join(hard_root, "MVidVRD")):
        # same generator/classes as the campaign data, video seed chain
        # seed=0 -> videos seed 1 (make_data uses seed+1); only density/
        # speed knobs differ
        make_data(hard_root, n_source=4, n_target=args.n_videos,
                  video_target=True, hard_videos=True)
        print(f"hard video set -> {hard_root}")
    with open(os.path.join(hard_root, "MVidVRD",
                           "video_annotations_test.json")) as f:
        gt = json.load(f)
    n_gt = sum(len(v) for v in gt.values())
    print(f"hard test set: {len(gt)} videos, {n_gt} GT relation instances")

    results = {"n_gt_hard": n_gt, "n_videos": len(gt),
               "ours_ckpt": args.ours_ckpt, "seed": args.seed}
    path = os.path.join(args.hard_out, "stage_c_hard.json")
    os.makedirs(args.hard_out, exist_ok=True)

    def finish(key, val):
        results[key] = val
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"{key}: {val}", flush=True)

    arms = args.arms.split(",")

    if "ours" in arms:
        ckpt_dir = os.path.dirname(args.ours_ckpt)
        step = int(os.path.basename(args.ours_ckpt))
        fn = build_scorer(ckpt_dir, step, int8=False, data_root=orig_root)
        os.environ["I2VSGG_DATA_ROOT"] = hard_root
        finish("ours_hard", eval_video_rel(fn, hard_root))
        os.environ["I2VSGG_DATA_ROOT"] = orig_root

    if "ref" in arms:
        # the ref trainer trains on the ORIGINAL campaign data (recipe
        # unchanged); its score_fn caches trunk fmaps by frame index, and
        # hard-video basenames can collide with training indices -> prefix
        # eval indices so the cache never serves a stale feature map
        import torch
        from tools import parity_run as pr
        os.environ["I2VSGG_DATA_ROOT"] = orig_root
        ref_fn = pr.train_reference_sgg(orig_root, args.out,
                                        0 if args.ref_head else args.steps,
                                        args.seed)
        # persist/restore the trained torch head for reuse
        head_path = args.ref_head or os.path.join(
            args.hard_out, f"ref_head_s{args.seed}.pth")
        # reach the head module through the closure-free route: the
        # trainer keeps it importable only via score_fn, so save/load act
        # on the module found in its closure cells
        mods = [c.cell_contents for c in (ref_fn.__closure__ or ())
                if hasattr(c.cell_contents, "state_dict")]
        if args.ref_head:
            assert mods, "score_fn closure has no module to restore into"
            for m in mods:
                try:
                    m.load_state_dict(torch.load(args.ref_head,
                                                 weights_only=True))
                    print(f"ref head restored from {args.ref_head}")
                    break
                except Exception:
                    continue
        elif mods:
            torch.save(mods[0].state_dict(), head_path)
            print(f"ref head saved -> {head_path}")
        os.environ["I2VSGG_DATA_ROOT"] = hard_root
        finish("ref_hard", eval_video_rel(
            lambda index, *a: ref_fn("hard::" + index, *a), hard_root))

    print(json.dumps({k: v for k, v in results.items()
                      if k.endswith("_hard")}))
    return results


if __name__ == "__main__":
    main()
