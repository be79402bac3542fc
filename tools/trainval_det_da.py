#!/usr/bin/env python
"""Stage A: adversarial domain-adaptive detector training.

TPU-native rebuild of ``trainval_net_instance_styleD_bilinear.py:48-437``:
source detection losses + target LSGAN discriminator passes in ONE jitted
SPMD train step, batches sharded over the mesh's data axis, epoch-boundary
LR decay, per-epoch checkpoints with the reference's metadata, and the same
loss-component scalar names.

Usage (mirrors scripts/instance_styleD_resnet101.sh):
  python tools/trainval_det_da.py --dataset MVRD --dataset_t MVidVRD \
      --net res101 --lr 5e-4 --lr_decay_step 10 --epochs 10 \
      --eta 0.1 --eta_style 0.001 --style_lambda 1 --ic --gc --cr
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    from i2vsgg_tpu.cli.args import parse_args, set_dataset_args
    args = set_dataset_args(parse_args(argv))

    import jax
    from i2vsgg_tpu.parallel.mesh import maybe_init_distributed
    multihost = maybe_init_distributed()   # before any device use

    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from i2vsgg_tpu.train.checkpoint import (latest_step, restore_detector_init,
                                             restore_full, save_checkpoint)
    from i2vsgg_tpu.train.det_da import create_train_state, make_train_step
    from i2vsgg_tpu.train.optim import sgd_reference, step_decay_schedule
    from i2vsgg_tpu.utils.logging import MetricsLogger, StepTimer

    base_cfg = Config()
    if os.path.exists(getattr(args, "cfg_file", "")):
        from i2vsgg_tpu.config import cfg_from_file
        base_cfg = cfg_from_file(args.cfg_file, base_cfg)
        print(f"loaded config {args.cfg_file}")
    cfg = cfg_from_list(args.set_cfgs + args.extra_cfgs, base_cfg).replace(
        COMPUTE_DTYPE=args.compute_dtype)
    np.random.seed(cfg.RNG_SEED)

    print(f"source roidb: {args.imdb_name}")
    imdb_s, roidb_s, _, idx_s = combined_roidb(args.imdb_name)
    print(f"target roidb: {args.imdb_name_target}")
    imdb_t, roidb_t, _, idx_t = combined_roidb(args.imdb_name_target)
    print(f"{len(roidb_s)} source / {len(roidb_t)} target images")

    bs = args.batch_size
    loader_s = DetectionLoader(roidb_s, idx_s, cfg, bs, training=True,
                               seed=cfg.RNG_SEED)
    loader_t = DetectionLoader(roidb_t, idx_t, cfg, bs, training=True,
                               seed=cfg.RNG_SEED + 1)
    steps_per_epoch = min(len(loader_s), len(loader_t))

    model = FasterRCNN_DA(num_classes=len(imdb_s.classes), cfg=cfg,
                          backbone=args.net, class_agnostic=args.class_agnostic,
                          ic=args.ic, gc=args.gc)
    # Param/optimizer init runs EAGERLY (op by op). On the axon TPU
    # backend every eager op is a remote round trip through the tunnel —
    # a res101 init sits for tens of minutes doing thousands of tiny
    # RPCs (measured: ~zero CPU, no progress). Pin the default device to
    # the host CPU backend for the whole setup phase; `replicate(state,
    # mesh)` below device_puts the finished tree onto the mesh in one
    # shot (same trick as bench.py's CPU-twin init).
    cpu_init = None
    if jax.default_backend() != "cpu":
        try:
            cpu_init = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu_init = None
    if cpu_init is not None:
        jax.config.update("jax_default_device", cpu_init)
    key = jax.random.PRNGKey(cfg.RNG_SEED)
    dummy = {
        "image": jnp.zeros((bs, 128, 160, 3), jnp.float32),
        "im_info": jnp.tile(jnp.asarray([[128, 160, 1.0]], jnp.float32),
                            (bs, 1)),
        "gt_boxes": jnp.zeros((bs, cfg.TRAIN.MAX_NUM_GT_BOXES, 5),
                              jnp.float32),
    }
    params = model.init(
        {"params": key, "sampling": jax.random.PRNGKey(1),
         "sampling2": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        dummy["image"], dummy["im_info"], dummy["gt_boxes"],
        mode="train_source")["params"]
    if args.zero_init_residual:
        def _zero_bn3(d, path=""):
            for k, v in d.items():
                if isinstance(v, dict):
                    if k == "bn3":
                        v["scale"] = jnp.zeros_like(v["scale"])
                    else:
                        _zero_bn3(v, path + "/" + k)
        params = jax.tree.map(lambda x: x, params)     # shallow copy ok
        params = jax.device_get(params)
        _zero_bn3(params)
        print("zero-init-residual: bn3 scales zeroed")

    schedule = step_decay_schedule(args.lr, args.lr_decay_step,
                                   args.lr_decay_gamma, steps_per_epoch)
    # the reference clips gradients at 10 for the VGG16 backbone
    # [trainval_net_instance_styleD_bilinear.py clip_gradient call];
    # --clip overrides (e.g. from-scratch runs need it on resnets too)
    clip = args.clip if args.clip >= 0 else (
        10.0 if args.net == "vgg16" else 0.0)
    tx = sgd_reference(schedule, cfg, clip_norm=clip)
    state = create_train_state(params, tx)

    ckpt_dir = os.path.join(args.save_dir, args.net, args.dataset,
                            f"session_{args.session}")
    if args.resume:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"--r given but no checkpoint in {ckpt_dir}")
        state = restore_full(ckpt_dir, step, state)
        print(f"resumed from step {step}")
    elif args.load_name not in ("", "models"):
        ld, ls = os.path.dirname(args.load_name), int(
            os.path.basename(args.load_name))
        params = restore_detector_init(ld, ls, state.params)
        state = create_train_state(params, tx)
        print(f"detector-init from {args.load_name} (heads re-initialized)")
    elif args.pretrained_backbone:
        from i2vsgg_tpu.utils.torch_import import (
            load_torch_checkpoint, resnet_trunk_params, resnet_head_params,
            vgg16_trunk_params, vgg16_head_params, jwyang_detector_params,
            merge_imported)
        from i2vsgg_tpu.train.checkpoint import DETECTOR_INIT_EXCLUDE
        sd = load_torch_checkpoint(args.pretrained_backbone)
        params = dict(state.params)
        if "RCNN_base.0.weight" in sd:
            # full jwyang-layout Faster R-CNN checkpoint (what the reference
            # starts Stage A from, trainval_…:153-183): import everything,
            # then drop the reference's exclusion list so the class heads
            # and netD_pixel re-init for the new run
            imported = jwyang_detector_params(sd, int(args.net[3:]))
            if not args.pretrained_full:
                for tag in DETECTOR_INIT_EXCLUDE:
                    imported.pop(tag, None)
                    if "rpn" in imported:
                        imported["rpn"].pop(tag, None)
            # shape-mismatched leaves (e.g. COCO 81-way vs our class count)
            # would raise in merge_imported; they were popped above
            params = merge_imported(params, imported)
            print(f"jwyang detector init from {args.pretrained_backbone} "
                  f"({sorted(imported)})")
        elif args.net == "vgg16":
            params["trunk"] = vgg16_trunk_params(sd)
            params["head"] = vgg16_head_params(sd)
        else:
            depth = int(args.net[3:])
            params["trunk"] = resnet_trunk_params(sd, depth)
            params["head"] = resnet_head_params(sd, depth)
        state = create_train_state(params, tx)
        print(f"backbone initialized from {args.pretrained_backbone}")

    # data axis must divide the GLOBAL batch (per-host bs x processes);
    # default to the largest device count that does
    import math
    global_bs = bs * jax.process_count()
    mesh = make_mesh(args.mesh or math.gcd(global_bs, len(jax.devices())))
    if multihost:
        print(f"multi-host: {jax.process_count()} processes, "
              f"{len(jax.devices())} global devices, "
              f"global batch {global_bs}")
    if cpu_init is not None:
        jax.config.update("jax_default_device", None)
    state = replicate(state, mesh)
    train_step = make_train_step(model, tx, eta=args.eta,
                                 eta_style=args.eta_style,
                                 style_lambda=args.style_lambda, cr=args.cr)

    logger = MetricsLogger(args.tfb_path or os.path.join(ckpt_dir, "logs"),
                           args.use_tfboard)
    timer = StepTimer()
    step_i = int(state.step)
    start_epoch = step_i // max(steps_per_epoch, 1) + 1

    with mesh:
        for epoch in range(start_epoch, args.max_epochs + 1):
            it_s, it_t = iter(loader_s), iter(loader_t)
            for _ in range(steps_per_epoch):
                batch_s = shard_batch(next(it_s), mesh)
                batch_t = shard_batch(next(it_t), mesh)
                batch_s.pop("indices", None), batch_t.pop("indices", None)
                batch_s.pop("num_boxes", None)
                batch_t.pop("num_boxes", None), batch_t.pop("gt_boxes", None)
                if args.profile_dir and step_i == 10:
                    jax.profiler.start_trace(args.profile_dir)
                state, metrics = train_step(
                    state, batch_s, batch_t,
                    jax.random.fold_in(key, step_i))
                step_i += 1
                if args.profile_dir and step_i == 20:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    print(f"profiler trace -> {args.profile_dir}")
                timer.tick(bs)
                if step_i % args.disp_interval == 0:
                    m = {k: float(v) for k, v in
                         jax.device_get(metrics).items()}
                    m["imgs_per_sec"] = timer.rate()
                    logger.log_scalars("train", m, step_i)
                    print(f"[session {args.session}][epoch {epoch:2d}]"
                          f"[iter {step_i:6d}] loss: {m['loss']:.4f} "
                          f"rpn_cls {m['loss_rpn_cls']:.4f} "
                          f"rpn_box {m['loss_rpn_box']:.4f} "
                          f"rcnn_cls {m['loss_rcnn_cls']:.4f} "
                          f"rcnn_box {m['loss_rcnn_box']:.4f} "
                          f"d_s {m['dloss_s_p']:.4f} d_t {m['dloss_t_p']:.4f} "
                          f"({m['imgs_per_sec']:.1f} img/s)")
                if args.max_steps and step_i >= args.max_steps:
                    break
            # only process 0 writes/GCs on the (typically shared) ckpt dir;
            # the barrier keeps other hosts from racing a subsequent restore
            if jax.process_index() == 0:
                save_checkpoint(ckpt_dir, state, step_i, metadata={
                    "session": args.session, "epoch": epoch,
                    "pooling_mode": cfg.POOLING_MODE,
                    "class_agnostic": args.class_agnostic, "net": args.net,
                    "dataset": args.dataset,
                    "classes": list(imdb_s.classes)},
                    keep_last=args.keep_ckpts or None)
                print(f"checkpoint @ step {step_i} (epoch {epoch})")
            if multihost:
                from i2vsgg_tpu.parallel.mesh import sync_global_devices
                sync_global_devices(f"ckpt_{step_i}")
            if args.max_steps and step_i >= args.max_steps:
                break
    logger.close()
    return state


if __name__ == "__main__":
    main()
