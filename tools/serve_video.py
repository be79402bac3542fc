#!/usr/bin/env python
"""Production video serving: fused det+SGG over a frame stream + association.

The deployment analogue of ``tools/test_sgg.py`` but with DETECTED boxes
(not GT): every frame batch runs the single fused XLA program
(backbone -> proposals -> per-class NMS -> top-K detections -> all-pair
predicate scoring, ``i2vsgg_tpu/serve.py``), frames shard across the chip
mesh (video-axis data parallelism), and only packed tuples land on host for
association into video-relation trajectories.

Contrast with the reference's serving loop (``test_net_SGG_emb.py:158-289``):
one GPU, one frame per step, detections round-tripped through host numpy
between the detector and the relation head. Here ``--mesh N`` spreads each
frame batch across N chips (params replicated, XLA partitions the fused
program; ragged tail batches are row-padded) and ``--buckets`` serves the
two-program detection-count-bucketed form (``serve.make_bucketed_program``).

Usage:
  python tools/serve_video.py --dataset MVidVRD --net res101 \
      --load_name <det ckpt> --sgg_load_name <sgg ckpt> [--bs 8] \
      [--mesh 8] [--buckets 4,8,16]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    from tools.trainval_sgg import load_predicate_vectors
    from tools.test_sgg import frame_key
    from i2vsgg_tpu.cli.args import parse_args, set_dataset_args

    import argparse
    # extra flag: the SGG checkpoint (detector ckpt goes in --load_name)
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--sgg_load_name", default="")
    extra.add_argument("--max_det", default=16, type=int)
    extra.add_argument("--mesh", default=0, type=int,
                       help="shard each frame batch over an N-device "
                            "(data, model) mesh — video-axis data "
                            "parallelism for the serving path (the "
                            "reference serves one GPU, one frame at a "
                            "time: test_net_SGG_emb.py:158-289). Params "
                            "replicate; XLA partitions the fused program "
                            "per chip; only packed tuples land on host. "
                            "--bs must be a multiple of N")
    extra.add_argument("--buckets", default="",
                       help="comma-separated detection-count buckets "
                            "(e.g. '4,8,16') — serve with the bucketed "
                            "two-program form (serve.make_bucketed_"
                            "program): per batch, the smallest SGG pair "
                            "program covering the batch's max detection "
                            "count runs. Exact (only padding differs); "
                            "wins when typical frames carry few "
                            "detections. Default: single fused program "
                            "at --max_det")
    extra.add_argument("--bf16_weights", action="store_true",
                       help="store serving weights in bf16 (halves weight "
                            "streaming; FrozenBatchNorm statistics and the "
                            "bbox_pred head stay fp32 — "
                            "utils.params.bf16_storage_cast)")
    extra.add_argument("--host_planes", action="store_true",
                       help="serving input-contract lever: the loader packs "
                            "conv1 parity planes on the HOST (numpy, bf16) "
                            "and the device skips the plane-construction "
                            "transpose; bit-identical to the Pallas conv1 "
                            "path (tests/test_pallas_conv1.py). Planes ship "
                            "at 2 B/px — half the f32 image upload. "
                            "Exclusive with --uint8_upload")
    ns, rest = extra.parse_known_args(argv)
    args = set_dataset_args(parse_args(rest), test=True)

    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.models.backbones import ResNetTrunk, VGG16Trunk
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.serve import make_frame_program, make_pair_indices
    from i2vsgg_tpu.train.checkpoint import (load_metadata,
                                             restore_intersection)
    from i2vsgg_tpu.video.association import association
    from i2vsgg_tpu.video.metrics import detection_output

    base_cfg = Config()
    if os.path.exists(getattr(args, "cfg_file", "")):
        from i2vsgg_tpu.config import cfg_from_file
        base_cfg = cfg_from_file(args.cfg_file, base_cfg)
    cfg = cfg_from_list(args.set_cfgs + args.extra_cfgs, base_cfg).replace(
        COMPUTE_DTYPE=args.compute_dtype)

    imdb, roidb, _, idx = combined_roidb(args.imdbval_name, training=False,
                                         use_flipped=False)
    print(f"{len(roidb)} frames ({args.imdbval_name})")
    loader = DetectionLoader(roidb, idx, cfg, args.batch_size, training=False,
                             uint8_transport=args.uint8_upload)

    prd_np = load_predicate_vectors(args)
    n_rel = prd_np.shape[0]
    md = ns.max_det
    dtype = jnp.dtype(cfg.COMPUTE_DTYPE)

    # eager init on the axon backend is one tunnel RPC per op (minutes
    # for a res101 — tools/trainval_det_da.py has the measurement); pin
    # setup to the host CPU backend, then device_put once
    cpu_init = None
    if jax.default_backend() != "cpu":
        try:
            cpu_init = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu_init = None
    if cpu_init is not None:
        jax.config.update("jax_default_device", cpu_init)
    det = FasterRCNN_DA(num_classes=len(imdb.classes), cfg=cfg,
                        backbone=args.net,
                        class_agnostic=args.class_agnostic,
                        ic=args.ic, gc=args.gc)
    det_params = det.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 128, 160, 3), jnp.float32),
                          jnp.asarray([[128, 160, 1.0]], jnp.float32),
                          mode="inference")["params"]
    if args.load_name not in ("", "models"):
        det_params = restore_intersection(
            os.path.dirname(args.load_name),
            int(os.path.basename(args.load_name)), det_params)
        print(f"detector: {args.load_name}")
    if ns.bf16_weights:
        from i2vsgg_tpu.utils.params import bf16_storage_cast
        det_params = bf16_storage_cast(det_params)
    if getattr(args, "act_scales", ""):
        # deployment form of the int8 trunk (the form the l34@3x3+static
        # quality gate validated): pre-quantize the in-scope kernels at
        # load time and attach calibrated STATIC act scales — BNConv then
        # quantizes inputs elementwise (fusable) instead of running the
        # dynamic abs-max pass + weight-requant chain every step
        from i2vsgg_tpu.utils.params import quantize_trunk_params
        kind, _, scope = (args.int8_trunk or "off").partition(":")
        assert kind in ("sim", "mxu"), \
            "--act_scales requires --int8_trunk sim:<scope> or mxu:<scope>"
        with open(args.act_scales) as f:
            sc = json.load(f)
        det_params = quantize_trunk_params(det_params, scope,
                                           sc.get("scales", sc))
        if kind == "sim":
            os.environ["I2VSGG_INT8_PREQ_SIM"] = "1"
        # in-scope kernels are int8 now (prequant branch wins); pop the
        # env gate so out-of-scope convs can't double-quantize
        os.environ.pop("I2VSGG_INT8_TRUNK", None)
        print(f"static act scales: {args.act_scales} (scope {scope!r})")
    else:
        os.environ.pop("I2VSGG_INT8_PREQ_SIM", None)
    det_params = jax.device_put(det_params, jax.devices()[0])  # commit once

    # the head must be built with the SAME pooling the SGG weights were
    # trained on (fc6/fc7 trained on quantized max-RoIPool features are NOT
    # interchangeable with bilinear RoIAlign features); read it from the
    # checkpoint metadata like the reference's in-checkpoint pooling_mode
    vrd_pooling = args.vrd_pooling
    if ns.sgg_load_name:
        try:
            meta = load_metadata(os.path.dirname(ns.sgg_load_name),
                                 int(os.path.basename(ns.sgg_load_name)))
            if "vrd_pooling" in meta:
                vrd_pooling = meta["vrd_pooling"]
                print(f"vrd pooling from checkpoint metadata: {vrd_pooling}")
        except FileNotFoundError:
            pass

    trunk = (VGG16Trunk(dtype=dtype) if args.net == "vgg16"
             else ResNetTrunk(depth=int(args.net[3:]), dtype=dtype))
    sgg = SGGModel(trunk=trunk,
                   vrd=VRDHead(emb_dim=args.emb_dim,
                               spatial_type=args.spatial_type,
                               use_obj_visual=args.use_obj_visual,
                               fc_dim=args.vrd_fc_dim, dtype=dtype,
                               pooling=vrd_pooling,
                               int8_fc=args.int8_fc6),
                   n_rel=n_rel)
    ix1_np, ix2_np = make_pair_indices(md)
    ixz = jnp.zeros((len(ix1_np),), jnp.int32)
    sgg_params = sgg.init(
        {"params": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, 10, 1024), dtype), jnp.asarray([128, 160, 1.0]),
        jnp.zeros((md, 4)), ixz, ixz, jnp.zeros(ixz.shape, bool),
        jnp.asarray(prd_np), method=SGGModel.head_on_features)["params"]
    if ns.sgg_load_name:
        sgg_params = restore_intersection(
            os.path.dirname(ns.sgg_load_name),
            int(os.path.basename(ns.sgg_load_name)), sgg_params)
        print(f"sgg head: {ns.sgg_load_name}")
    if ns.bf16_weights:
        from i2vsgg_tpu.utils.params import bf16_storage_cast
        sgg_params = bf16_storage_cast(sgg_params)
    if args.int8_fc6:
        # hoist the fc-tower weight-quant chain to load time (~3 ms/step
        # in-program otherwise — tools/sgg_dissect.py; bit-identical taps)
        from i2vsgg_tpu.utils.params import quantize_dense_params
        sgg_params = quantize_dense_params(sgg_params)
    sgg_params = jax.device_put(sgg_params, jax.devices()[0])  # commit once
    if cpu_init is not None:
        jax.config.update("jax_default_device", None)

    import contextlib
    mesh_ctx = contextlib.nullcontext()
    mesh = None
    if ns.mesh:
        from i2vsgg_tpu.parallel.mesh import make_mesh, replicate
        assert args.batch_size % ns.mesh == 0, \
            f"--bs {args.batch_size} must be a multiple of --mesh {ns.mesh}"
        mesh = make_mesh(ns.mesh)
        # params replicate onto every chip ONCE; each batch's frames then
        # shard over the data axis and XLA partitions the fused program
        det_params = replicate(det_params, mesh)
        sgg_params = replicate(sgg_params, mesh)
        mesh_ctx = mesh
        print(f"serving over {ns.mesh}-device mesh "
              f"(data-parallel frame batches of {args.batch_size})")

    if ns.buckets:
        from i2vsgg_tpu.serve import make_bucketed_program
        buckets = tuple(int(b) for b in ns.buckets.split(","))
        assert buckets[-1] == md or md in buckets, \
            f"--max_det {md} must be the largest bucket (got {buckets})"
        program = make_bucketed_program(det, det_params, sgg, sgg_params,
                                        prd_np, cfg, buckets=buckets)
    else:
        program = make_frame_program(det, det_params, sgg, sgg_params,
                                     prd_np, cfg, max_det=md)
    img_key = "image"
    if ns.host_planes:
        assert not args.uint8_upload, \
            "--host_planes and --uint8_upload are exclusive (planes ship bf16)"
    if args.uint8_upload:
        # 4x smaller host->device transfers: frames ship as resized uint8
        # BGR; mean subtraction + pad re-zeroing fuse into the program
        from i2vsgg_tpu.data.pipeline import dequantize_image_u8
        base_program, img_key = program, "image_u8"

        @jax.jit
        def program(image_u8, im_info):
            return base_program(
                dequantize_image_u8(image_u8, im_info, cfg.PIXEL_MEANS),
                im_info)

    frame_detections = {}
    t0 = time.time()
    done = 0
    for batch in loader:
        raw = np.asarray(batch["image" if ns.host_planes else img_key])
        info_np = np.asarray(batch["im_info"])
        if mesh is not None and raw.shape[0] % ns.mesh:
            # ragged tail batch: pad rows to the mesh multiple (the
            # padded frames' tuples are dropped by the indices loop)
            pad = -raw.shape[0] % ns.mesh
            raw = np.concatenate([raw, np.repeat(raw[-1:], pad, 0)], 0)
            info_np = np.concatenate(
                [info_np, np.repeat(info_np[-1:], pad, 0)], 0)
        if ns.host_planes:
            from i2vsgg_tpu.ops.pallas.conv1_kernel import Conv1Planes
            imgs = Conv1Planes.pack(raw.astype(np.float32))
        else:
            imgs = jnp.asarray(raw)
        info = jnp.asarray(info_np)
        if mesh is not None:
            from i2vsgg_tpu.parallel.mesh import shard_batch
            sharded = shard_batch({"image": imgs, "im_info": info}, mesh)
            imgs, info = sharded["image"], sharded["im_info"]
        with mesh_ctx:
            out = jax.device_get(program(imgs, info))
        for bi, ridx in enumerate(batch["indices"]):
            index = os.path.splitext(os.path.basename(
                roidb[int(ridx)]["image"]))[0]
            vid, fno = frame_key(index, None)
            valid = out["det_valid"][bi]
            pv = out["pair_valid"][bi]
            res = detection_output(
                out["rel_prob"][bi][pv], out["boxes"][bi][valid],
                out["classes"][bi][valid], out["scores"][bi][valid],
                # remap pair indices into the valid-compacted box list
                np.cumsum(valid)[out["ix1"][pv]] - 1,
                np.cumsum(valid)[out["ix2"][pv]] - 1, top_k=100)
            tuples = []
            if res is not None:
                rlp, tconfs, sboxes, oboxes, _ = res
                for t in range(len(tconfs)):
                    tuples.append([float(tconfs[t]),
                                   [int(c) for c in rlp[t]],
                                   [sboxes[t].tolist(), oboxes[t].tolist()],
                                   t])
            frame_detections.setdefault(vid, []).append([fno, tuples])
            done += 1
        if done % 200 < args.batch_size:
            print(f"  {done} frames ({done / (time.time() - t0):.1f} fps)")

    fps = done / (time.time() - t0)
    out_dir = os.path.join(args.save_dir, "serve", args.imdbval_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "frame_detections.json"), "w") as f:
        json.dump(frame_detections, f)
    video_relations = association(frame_detections,
                                  objects=list(imdb.classes),
                                  predicates=[str(i) for i in range(n_rel)])
    with open(os.path.join(out_dir, "video_relations.json"), "w") as f:
        json.dump(video_relations, f)
    print(f"{done} frames -> {sum(len(v) for v in video_relations.values())} "
          f"video relations at {fps:.1f} fps (end-to-end incl. host)")
    return video_relations


if __name__ == "__main__":
    main()
