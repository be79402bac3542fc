#!/usr/bin/env python
"""Bisect the SGG-head portion of the fused serving program on the live
chip: det+decode (baseline) -> +align -> +fc towers -> full head.

Runs at the SHIPPED levered config (b16 rpn64/pre512 det8 int8fc
int8trunk[l34,@3x3]) so the stage deltas map directly onto the 38.0 ms
step budget (PERF.md round 4: full-SGG delta was 5.16 ms at rpn128 —
what's inside it was never measured).

XLA DCE makes the staging honest: at stage="align" the mask/tower work
is dead code, at "fc" the towers are, so each delta isolates one group:
  align - base   = union/pair prep + RoIAlign einsums
  fc    - align  = fc6/fc7 (int8) + fc8 + so/obj embeddings
  full  - fc     = dual masks + conv tower + fusion + cosine + softmax
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max-det", type=int, default=8)
    ap.add_argument("--rpn-topn", type=int, default=64)
    ap.add_argument("--pre-nms", type=int, default=512)
    ap.add_argument("--int8-trunk-scope", default="1:layer3,layer4,@3x3")
    ap.add_argument("--stages", default="base,align,fc,full")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "axon,cpu")

    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.serve import (decode_detections, make_pair_indices,
                                  make_union_dedup)
    from i2vsgg_tpu.utils.params import (bf16_storage_cast,
                                         quantize_dense_params,
                                         quantize_trunk_params)

    cfg = cfg_from_list(["TEST.RPN_POST_NMS_TOP_N", str(args.rpn_topn),
                         "TEST.RPN_PRE_NMS_TOP_N", str(args.pre_nms)],
                        Config())
    b, h, w = args.batch, args.height, args.width
    md = args.max_det
    images = jnp.asarray(
        np.random.RandomState(0).randn(b, h, w, 3).astype(np.float32) * 20)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))

    det = FasterRCNN_DA(num_classes=16, cfg=cfg, backbone="res101",
                        ic=True, gc=True)
    dtype = jnp.dtype(cfg.COMPUTE_DTYPE)
    sgg = SGGModel(trunk=ResNetTrunk(depth=101, dtype=dtype),
                   vrd=VRDHead(dtype=dtype, pooling="align", int8_fc=True),
                   n_rel=26)
    prd_vecs = np.random.RandomState(1).randn(26, 300).astype(np.float32)

    cpu = jax.devices("cpu")[0]
    tiny = cfg.replace(
        TRAIN=cfg.TRAIN.__class__(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
                                  RPN_POST_NMS_TOP_N_TARGET=8,
                                  RPN_BATCHSIZE=16, BATCH_SIZE=8,
                                  MAX_NUM_GT_BOXES=4),
        TEST=cfg.TEST.__class__(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16))
    det_twin = FasterRCNN_DA(num_classes=16, cfg=tiny, backbone="res101",
                             ic=True, gc=True)
    with jax.default_device(cpu):
        hi, wi = 128, 160
        info_i = jnp.asarray([[hi, wi, 1.0]], jnp.float32)
        det_params = det_twin.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, hi, wi, 3), jnp.float32), info_i,
            mode="inference")["params"]
        ix = jnp.zeros((md * (md - 1),), jnp.int32)
        base_feat = jnp.zeros((1, hi // 16, wi // 16, 1024), dtype)
        sgg_params = sgg.init(
            {"params": jax.random.PRNGKey(1)},
            base_feat, info_i[0], jnp.zeros((md, 4), jnp.float32),
            ix, ix, jnp.zeros(ix.shape, bool), jnp.asarray(prd_vecs),
            method=SGGModel.head_on_features)["params"]
    det_params = bf16_storage_cast(det_params)
    sgg_params = quantize_dense_params(bf16_storage_cast(sgg_params))
    scope = args.int8_trunk_scope.partition(":")[2]
    det_params = quantize_trunk_params(det_params, scope, None)
    dev = jax.devices()[0]
    det_params = jax.device_put(det_params, dev)
    sgg_params = jax.device_put(sgg_params, dev)
    os.environ["I2VSGG_INT8_TRUNK"] = args.int8_trunk_scope

    ix1_np, ix2_np = make_pair_indices(md)
    pair_static = make_union_dedup(ix1_np, ix2_np)
    prd = jnp.asarray(prd_vecs)
    ix1 = jnp.asarray(ix1_np)
    ix2 = jnp.asarray(ix2_np)

    def tree_sum(d):
        leaves = [v for v in jax.tree_util.tree_leaves(d)
                  if jnp.issubdtype(v.dtype, jnp.floating)]
        return sum(jnp.sum(v.astype(jnp.float32)) for v in leaves)

    def make_program(stage):
        @jax.jit
        def _program(det_params, sgg_params, images, im_info):
            out = det.apply({"params": det_params}, images, im_info,
                            mode="inference")
            dets = decode_detections(out["rois"], out["roi_valid"],
                                     out["cls_prob"], out["bbox_pred"],
                                     im_info, cfg, max_det=md,
                                     max_per_class=8)
            acc = (jnp.sum(dets.boxes) + jnp.sum(dets.scores)
                   + jnp.sum(out["base_feat"].astype(jnp.float32)))
            if stage == "base":
                return acc

            def one_frame(base_feat, info, boxes, valid):
                boxes_in = boxes * info[2]
                pair_valid = valid[ix1] & valid[ix2]
                res = sgg.apply(
                    {"params": sgg_params}, base_feat[None], info,
                    boxes_in, ix1, ix2, pair_valid, prd,
                    pair_static=pair_static, deterministic=True,
                    stage=stage if stage != "full" else "full",
                    method=SGGModel.head_on_features)
                return tree_sum(res)

            s = jax.vmap(one_frame)(out["base_feat"], im_info,
                                    dets.boxes, dets.valid)
            return acc + jnp.sum(s)

        return lambda im, info: _program(det_params, sgg_params, im, info)

    for stage in args.stages.split(","):
        prog = make_program(stage)
        t0 = time.time()
        jax.device_get(prog(images, im_info))
        print(f"[{stage}] compile+first: {time.time() - t0:.1f}s",
              flush=True)
        for _ in range(3):
            jax.device_get(prog(images, im_info))
        t0 = time.time()
        out = None
        for _ in range(args.steps):
            out = prog(images, im_info)
        jax.device_get(out)
        dt = (time.time() - t0) / args.steps * 1e3
        print(f"{stage:6s} {dt:7.3f} ms/step ({args.steps * b * 1e3 / (dt * args.steps):.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
