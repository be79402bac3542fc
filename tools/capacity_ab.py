#!/usr/bin/env python
"""Quality A/B of SERVING capacity cuts at the bench's 600-pixel scale
(round-2 verdict items 3-4): train our detector on a 600-scale learnable
dataset once, then evaluate the SAME weights at several
(TEST.RPN_POST_NMS_TOP_N, max_det) capacities. A capacity is
quality-validated when its mAP matches the full-capacity eval.

The bench headline must run at a capacity this A/B validates
(BENCH_CONFIG.md records the result).

Usage:
  I2VSGG_PARITY_TPU=1 python tools/capacity_ab.py --out runs/capacity_ab \
      --steps 600
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# 600-short-side config, reference anchors (cfgs/res101.yml semantics)
CFG = ["ANCHOR_SCALES", "[4, 8, 16]",
       "TRAIN.SCALES", "[600]", "TEST.SCALES", "[600]",
       "TRAIN.RPN_PRE_NMS_TOP_N", "6000",
       "TRAIN.RPN_POST_NMS_TOP_N", "256",
       "TRAIN.RPN_POST_NMS_TOP_N_TARGET", "128",
       "TEST.RPN_PRE_NMS_TOP_N", "6000",
       "POOLING_MODE", "align"]


def make_data(root, n=200, split=0.4):
    from tests.fixtures import make_learnable_dataset
    os.makedirs(root, exist_ok=True)
    make_learnable_dataset(root, "MVRD", n, ".jpg", seed=11,
                           hw=(600, 800), split_frac=split,
                           min_obj=2, max_obj=6, size_range=(60, 220))
    # tiny target set (DA needs one; quality question is source-side)
    make_learnable_dataset(root, "MVidVRD", 24, ".png", seed=12,
                           hw=(600, 800), index_fmt="vid00_{:04d}",
                           min_obj=2, max_obj=6, size_range=(60, 220))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/capacity_ab")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--net", default="res101")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--ckpt", default="",
                    help="run the sweep on an EXISTING checkpoint instead "
                         "of training one (e.g. the best converged parity "
                         "checkpoint — the advisor flagged that the "
                         "zero_init_residual training below produces a "
                         "degenerate trunk, weak A/B evidence)")
    ap.add_argument("--data", default="",
                    help="with --ckpt: the data root the checkpoint was "
                         "trained on (its cfg/scale must match --cfg)")
    ap.add_argument("--cfg", nargs="*", default=None,
                    help="with --ckpt: config overrides replacing the "
                         "default 600-scale CFG (pass the checkpoint's "
                         "training overrides)")
    ap.add_argument("--dataset", default="MVRD")
    ap.add_argument("--rows", default="",
                    help="comma-separated pre:post:det triples overriding "
                         "the default 7-row sweep (e.g. "
                         "'6000:300:100,1024:128:8') — lets a wall-clock-"
                         "bounded campaign run the decision-critical rows "
                         "first (results persist per row)")
    args = ap.parse_args(argv)
    if args.cfg is not None:
        global CFG
        CFG = list(args.cfg)

    import jax
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")

    data_root = args.data or os.path.join(args.out, "data")
    if not args.ckpt and not os.path.isdir(os.path.join(data_root, "MVRD")):
        make_data(data_root)
        print(f"600-scale learnable dataset -> {data_root}")
    os.environ["I2VSGG_DATA_ROOT"] = data_root

    ckpt_dir = os.path.join(args.out, args.net, "MVRD", "session_902")
    if args.ckpt:
        ckpt_dir = os.path.dirname(args.ckpt)
        args.skip_train = True
        # the checkpoint dictates the architecture: evaluating a res50
        # ckpt with the res101 default silently left the trunk at random
        # init (mAP 0.0 both rows, runs/capacity_ab_r64 round 4 — the
        # restore now also hard-errors on low match fraction)
        for net in ("res50", "res101"):
            if f"/{net}/" in f"/{args.ckpt}/" and args.net != net:
                print(f"--net {args.net} contradicts ckpt path "
                      f"({net}); using {net}")
                args.net = net
    if not args.skip_train:
        from tools.trainval_det_da import main as train_main
        train_main([
            "--dataset", "MVRD", "--dataset_t", "MVidVRD",
            "--net", args.net, "--bs", "1",
            "--epochs", "99", "--max_steps", str(args.steps),
            "--lr", "5e-4", "--lr_decay_step", "5",
            "--eta", "0.1", "--eta_style", "0.001", "--style_lambda", "1",
            "--clip", "10", "--ic", "--gc", "--zero_init_residual",
            "--disp_interval", "20", "--s", "902",
            "--save_dir", args.out, "--cfg"] + CFG)

    from i2vsgg_tpu.train.checkpoint import latest_step
    step = (int(os.path.basename(args.ckpt)) if args.ckpt
            else latest_step(ckpt_dir))
    assert step, f"no checkpoint in {ckpt_dir}"

    from tools.test_det import main as eval_main
    results = {}
    # (pre_nms, post_nms, max_det): full reference capacity first, then
    # each serving cut on its own and combined
    sweep = [(6000, 300, 100), (6000, 128, 100), (1024, 128, 100),
             (1024, 128, 16), (6000, 300, 16),
             # max_det 16->8 quarters the SGG union-fc6 tower (pairs
             # 240->56) — the single biggest serving line (~4.8 ms);
             # round-3 verdict item 5 gates that cut on quality here
             (1024, 128, 8), (6000, 300, 8)]
    if args.rows:
        # pre:post:det or pre:post:det:mpc (mpc = per-class NMS keep cap,
        # TEST.MAX_PER_CLASS; 0/absent ties it to max_det)
        sweep = [tuple(int(x) for x in row.split(":"))
                 for row in args.rows.split(",")]
    for row in sweep:
        pre_nms, rpn_topn, max_det = row[:3]
        mpc = row[3] if len(row) > 3 else 0
        t0 = time.time()
        aps = eval_main([
            "--dataset", args.dataset, "--net", args.net, "--bs", "1",
            "--ic", "--gc",
            # per-process detections dir: two A/B processes sharing one
            # save_dir interleave per-class detection files and the AP is
            # computed over a corrupted mixture (round-4 postmortem #4)
            "--save_dir", os.path.join(args.out, f"eval_pid{os.getpid()}"),
            "--load_name", os.path.join(ckpt_dir, str(step)),
            "--cfg"] + CFG + ["TEST.RPN_POST_NMS_TOP_N", str(rpn_topn),
                              "TEST.RPN_PRE_NMS_TOP_N", str(pre_nms),
                              "TEST.MAX_DETECTIONS_PER_IMAGE",
                              str(max_det),
                              "TEST.MAX_PER_CLASS", str(mpc)])
        key = (f"pre{pre_nms}_rpn{rpn_topn}_det{max_det}"
               + (f"_mpc{mpc}" if mpc else ""))
        results[key] = {"mAP": float(aps["mAP"]),
                        "eval_s": round(time.time() - t0, 1)}
        print(f"{key}: mAP {results[key]['mAP']:.4f}")
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "capacity_ab.json"), "w") as f:
            json.dump({"step": step, "ckpt_dir": ckpt_dir,
                       "dataset": args.dataset, "results": results},
                      f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
