#!/usr/bin/env python
"""Detection evaluation driver.

Rebuild of ``test_net_instance_styleD_bilinear.py:42-237``: per-image
inference -> on-device bbox decode + per-class NMS + top-100 cap (all inside
one jitted program, ``i2vsgg_tpu/serve.py:decode_detections`` — the
reference did this on CPU in a Python loop) -> VOC mAP via
``imdb.evaluate_detections``.

Usage:
  python tools/test_det.py --dataset MVidVRD --net res101 \
      --load_name models/res101/MVRD/session_1/<step>
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_detection(model, params, loader, cfg, num_classes, max_det=100):
    """Yield (indices, Detections) per batch, jitted once per bucket shape."""
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.serve import decode_detections
    from i2vsgg_tpu.data.pipeline import dequantize_image_u8

    @jax.jit
    def infer(params, image, im_info):
        out = model.apply({"params": params}, image, im_info,
                          mode="inference")
        return decode_detections(
            out["rois"], out["roi_valid"], out["cls_prob"], out["bbox_pred"],
            im_info, cfg, max_det=max_det,
            max_per_class=cfg.TEST.MAX_PER_CLASS or max_det,
            score_thresh=0.0)

    @jax.jit
    def infer_u8(params, image_u8, im_info):
        # uint8 transport: 4x smaller uploads through the tunnel/DCN;
        # mean subtraction + pad re-zeroing happen on device
        return infer(params, dequantize_image_u8(image_u8, im_info,
                                                 cfg.PIXEL_MEANS), im_info)

    # keep a window of batches in flight: a synchronous device_get per
    # batch serializes upload/compute/download through the axon tunnel
    # (measured 0.6 im/s; dispatch is async, only the fetch blocks)
    import time as _time
    from collections import deque
    phase = {"load": 0.0, "dispatch": 0.0, "fetch": 0.0, "n": 0}
    pending = deque()
    it = iter(loader)
    while True:
        t0 = _time.time()
        batch = next(it, None)
        phase["load"] += _time.time() - t0
        if batch is None:
            break
        t0 = _time.time()
        if "image_u8" in batch:
            dets = infer_u8(params, jnp.asarray(batch["image_u8"]),
                            jnp.asarray(batch["im_info"]))
        else:
            dets = infer(params, jnp.asarray(batch["image"]),
                         jnp.asarray(batch["im_info"]))
        phase["dispatch"] += _time.time() - t0
        pending.append((batch["indices"], dets))
        if len(pending) >= 6:
            idx0, d0 = pending.popleft()
            t0 = _time.time()
            out = jax.device_get(d0)
            phase["fetch"] += _time.time() - t0
            phase["n"] += 1
            yield idx0, out
    while pending:
        idx0, d0 = pending.popleft()
        t0 = _time.time()
        out = jax.device_get(d0)
        phase["fetch"] += _time.time() - t0
        phase["n"] += 1
        yield idx0, out
    print(f"  eval phases: load {phase['load']:.1f}s "
          f"dispatch {phase['dispatch']:.1f}s fetch {phase['fetch']:.1f}s "
          f"({phase['n']} batches)", flush=True)


def main(argv=None):
    from i2vsgg_tpu.cli.args import parse_args, set_dataset_args
    args = set_dataset_args(parse_args(argv), test=True)

    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.train.checkpoint import (latest_step, load_metadata,
                                             restore_intersection)

    base_cfg = Config()
    if os.path.exists(getattr(args, "cfg_file", "")):
        from i2vsgg_tpu.config import cfg_from_file
        base_cfg = cfg_from_file(args.cfg_file, base_cfg)
        print(f"loaded config {args.cfg_file}")
    cfg = cfg_from_list(args.set_cfgs + args.extra_cfgs, base_cfg).replace(
        COMPUTE_DTYPE=args.compute_dtype)

    imdb, roidb, _, idx = combined_roidb(args.imdbval_name, training=False,
                                         use_flipped=False)
    print(f"{len(roidb)} eval images ({args.imdbval_name})")
    loader = DetectionLoader(roidb, idx, cfg, args.batch_size, training=False,
                             uint8_transport=args.uint8_upload)

    model = FasterRCNN_DA(num_classes=len(imdb.classes), cfg=cfg,
                          backbone=args.net,
                          class_agnostic=args.class_agnostic,
                          ic=args.ic, gc=args.gc)
    # eager init on the axon backend is one tunnel RPC per op (minutes
    # for a res101 — tools/trainval_det_da.py has the measurement); pin
    # setup to the host CPU backend, then device_put once below
    cpu_init = None
    if jax.default_backend() != "cpu":
        try:
            cpu_init = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu_init = None
    if cpu_init is not None:
        jax.config.update("jax_default_device", cpu_init)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 128, 160, 3), jnp.float32),
                        jnp.asarray([[128, 160, 1.0]], jnp.float32),
                        mode="inference")["params"]

    if args.load_name not in ("", "models"):
        ckpt_dir = os.path.dirname(args.load_name)
        step = int(os.path.basename(args.load_name))
        params = restore_intersection(ckpt_dir, step, params)
        meta = load_metadata(ckpt_dir, step)
        # pooling_mode travels in the checkpoint and overrides cfg
        # [test_net_instance_styleD_bilinear.py:80-81]
        if meta.get("pooling_mode"):
            cfg = cfg.replace(POOLING_MODE=meta["pooling_mode"])
        print(f"loaded {args.load_name}")
    if getattr(args, "act_scales", ""):
        # static-activation-scale int8 trunk: pre-quantize the in-scope
        # kernels and attach calibrated act_scale params — BNConv then
        # quantizes inputs elementwise (fusable) instead of the dynamic
        # abs-max pass. 'sim' kind evals the fake-quant twin (CPU gates;
        # equivalence to the int8 path pinned in tests/test_int8_trunk.py)
        import json as _json
        from i2vsgg_tpu.utils.params import quantize_trunk_params
        kind, _, scope = (args.int8_trunk or "off").partition(":")
        assert kind in ("sim", "mxu"), \
            "--act_scales requires --int8_trunk sim:<scope> or mxu:<scope>"
        with open(args.act_scales) as f:
            sc = _json.load(f)
        params = quantize_trunk_params(params, scope,
                                       sc.get("scales", sc))
        if kind == "sim":
            os.environ["I2VSGG_INT8_PREQ_SIM"] = "1"
        # in-scope kernels are int8 now (prequant branch wins); pop the
        # env gate so out-of-scope convs can't double-quantize
        os.environ.pop("I2VSGG_INT8_TRUNK", None)
        print(f"static act scales: {args.act_scales} (scope {scope!r})")
    else:
        os.environ.pop("I2VSGG_INT8_PREQ_SIM", None)
    # restored params are HOST numpy — commit once, or every jitted batch
    # re-uploads the full ~100MB param tree (measured 6.7 s/batch)
    if cpu_init is not None:
        jax.config.update("jax_default_device", None)
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = jax.device_put(params)

    n = len(roidb)
    all_boxes = [[np.empty((0, 5), np.float32) for _ in range(n)]
                 for _ in range(len(imdb.classes))]
    max_det = cfg.TEST.MAX_DETECTIONS_PER_IMAGE
    t0 = time.time()
    done = 0
    for indices, dets in run_detection(model, params, loader, cfg,
                                       len(imdb.classes), max_det):
        for bi, img_i in enumerate(indices):
            keep = dets.valid[bi]
            for j in range(1, len(imdb.classes)):
                sel = keep & (dets.classes[bi] == j)
                all_boxes[j][img_i] = np.hstack(
                    [dets.boxes[bi][sel],
                     dets.scores[bi][sel][:, None]]).astype(np.float32)
            done += 1
        if done % 100 < args.batch_size:
            print(f"  {done}/{n} images ({done / (time.time() - t0):.1f}/s)")

    out_dir = os.path.join(args.save_dir, "eval", args.imdbval_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "detections.pkl"), "wb") as f:
        pickle.dump(all_boxes, f)
    aps = imdb.evaluate_detections(all_boxes, out_dir, setting="adapt")
    print(f"total eval time {time.time() - t0:.1f}s")
    return aps


if __name__ == "__main__":
    main()
