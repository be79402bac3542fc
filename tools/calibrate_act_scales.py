#!/usr/bin/env python
"""Calibrate STATIC per-tensor activation scales for the int8 trunk.

The dynamic int8 path computes abs-max over each conv's input fmap every
step — an unfusable extra HBM pass per quantized conv that was measured
to eat most of the int8 MXU-rate win (PERF.md round 4,
tools/int8_conv_micro.py). This tool replaces it: run the fp model over
N calibration images with ``I2VSGG_INT8_CALIB=1`` (BNConv sows its
input abs-max — models/backbones.py), take the max over batches per
module path, and write ``{path: absmax/127}`` JSON for
``utils.params.quantize_trunk_params(..., act_scales=...)``.

Calibration-set choice follows the usual post-training-quantization
recipe (per-tensor symmetric, abs-max over a few hundred images);
outliers beyond the calibrated range saturate at +-127 in serving.

Usage (converged checkpoint, parity synthetic set):
  python tools/calibrate_act_scales.py \
      --ckpt runs/parity_r3/res50/MVRD/session_ref1/672 \
      --dataset MVRD --net res50 --n_images 64 \
      --json runs/quant_trunk_ab/act_scales.json \
      --cfg ANCHOR_SCALES "[2, 4, 8]" TEST.SCALES "[240]" \
            POOLING_MODE align
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def flatten_absmax(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if k == "act_absmax":
            v = v[0] if isinstance(v, tuple) else v
            out["/".join(prefix)] = float(v)
        elif isinstance(v, dict):
            out.update(flatten_absmax(v, prefix + (k,)))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="MVRD")
    ap.add_argument("--net", default="res50")
    ap.add_argument("--n_images", type=int, default=64)
    ap.add_argument("--bs", type=int, default=4)
    # default OUTSIDE runs/quant_trunk_ab: bench.py::_gate_int8trunk
    # globs that dir for A/B artifacts, and a calibration JSON parked
    # there reads as "incomplete A/B" in the gate tail (round-4 verdict
    # weakness #1)
    ap.add_argument("--json", default="runs/calib/act_scales.json")
    ap.add_argument("--cfg", nargs="*", default=[])
    ap.add_argument("--data", default="runs/parity_r3/data")
    args = ap.parse_args(argv)

    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    os.environ.setdefault("I2VSGG_DATA_ROOT", args.data)
    os.environ["I2VSGG_INT8_CALIB"] = "1"

    import jax
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.train.checkpoint import (load_metadata,
                                             restore_intersection)

    cfg = cfg_from_list(list(args.cfg), Config())
    imdb, roidb, _, idx = combined_roidb(f"{args.dataset}_test",
                                         training=False, use_flipped=False)
    loader = DetectionLoader(roidb, idx, cfg, args.bs, training=False)

    model = FasterRCNN_DA(num_classes=len(imdb.classes), cfg=cfg,
                          backbone=args.net, ic=True, gc=True)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 128, 160, 3), jnp.float32),
                        jnp.asarray([[128, 160, 1.0]], jnp.float32),
                        mode="inference")["params"]
    ckpt_dir = os.path.dirname(args.ckpt)
    step = int(os.path.basename(args.ckpt))
    params = restore_intersection(ckpt_dir, step, params)
    meta = load_metadata(ckpt_dir, step)
    if meta.get("pooling_mode"):
        cfg = cfg.replace(POOLING_MODE=meta["pooling_mode"])
        model = FasterRCNN_DA(num_classes=len(imdb.classes), cfg=cfg,
                              backbone=args.net, ic=True, gc=True)

    absmax: dict = {}
    seen = 0
    for bi, batch in enumerate(loader):
        if seen >= args.n_images:
            break
        _, inter = model.apply(
            {"params": params}, jnp.asarray(batch["image"]),
            jnp.asarray(batch["im_info"]), mode="inference",
            mutable=["intermediates"])
        for path, v in flatten_absmax(inter["intermediates"]).items():
            absmax[path] = max(absmax.get(path, 0.0), v)
        seen += batch["image"].shape[0]
        print(f"batch {bi}: {seen} images", flush=True)

    scales = {k: v / 127.0 for k, v in absmax.items()}
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump({"ckpt": args.ckpt, "n_images": seen,
                   "scales": scales}, f, indent=1, sort_keys=True)
    print(f"wrote {len(scales)} scales ({seen} images) -> {args.json}")
    return scales


if __name__ == "__main__":
    main()
