#!/usr/bin/env python
"""Stage B: relation (SGG) head training on frozen detector features.

Rebuild of the intended flow of ``trainval_net_SGG_emb.py`` (the shipped
driver is broken — SURVEY.md §8.1): GT object pairs per source image are
scored against GloVe predicate embeddings and trained with multi-label BCE;
only the vrd head receives gradients (frozen trunk restored from a Stage-A
checkpoint, reference load mode 3).

GT relations come from a pickle ``{image_index: [(s_idx, pred_id, o_idx)]}``
(the canonical schema for the reference's ``source_gt_rels.pkl``, keyed by
image path there — ``resnet_SGG_emb.py:74-79``).

Usage (mirrors scripts/SGG_emb_resnet.sh):
  python tools/trainval_sgg.py --dataset MVRD --net res101 --vrd_lr 1e-4 \
      --num_relations 62 --load_name models/res101/MVRD/session_1/<step> \
      --source_gt_rels_path data/MVidVRD/source_gt_rels.pkl
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_predicate_vectors(args):
    """GloVe predicate vectors, or deterministic random fallback when the
    GloVe file is absent (smoke runs)."""
    import json
    if os.path.exists(args.glove_path) and os.path.exists(args.predicate_file):
        from i2vsgg_tpu.models.glove import get_obj_prd_vecs
        _, prd = get_obj_prd_vecs(args.glove_path, args.predicate_file)
        return prd.astype(np.float32)
    print(f"WARNING: glove/predicates not found "
          f"({args.glove_path}, {args.predicate_file}); "
          "using fixed random predicate vectors")
    return np.random.RandomState(0).randn(
        args.num_relations, 300).astype(np.float32)


def main(argv=None):
    from i2vsgg_tpu.cli.args import parse_args, set_dataset_args
    args = set_dataset_args(parse_args(argv))

    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.models.backbones import ResNetTrunk, VGG16Trunk
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from i2vsgg_tpu.train.checkpoint import (restore_sgg_init,
                                             save_checkpoint)
    from i2vsgg_tpu.train.det_da import create_train_state
    from i2vsgg_tpu.train.sgg import (build_pair_batch, make_sgg_train_step,
                                      sgg_optimizer)
    from i2vsgg_tpu.utils.logging import MetricsLogger, StepTimer

    base_cfg = Config()
    if os.path.exists(getattr(args, "cfg_file", "")):
        from i2vsgg_tpu.config import cfg_from_file
        base_cfg = cfg_from_file(args.cfg_file, base_cfg)
        print(f"loaded config {args.cfg_file}")
    cfg = cfg_from_list(args.set_cfgs + args.extra_cfgs, base_cfg).replace(
        COMPUTE_DTYPE=args.compute_dtype)

    # flips are disabled: relation triples index into the ORIGINAL gt order
    imdb, roidb, _, idx = combined_roidb(args.imdb_name, use_flipped=False)
    print(f"{len(roidb)} source images ({args.imdb_name})")

    gt_rels = {}
    if os.path.exists(args.source_gt_rels_path):
        with open(args.source_gt_rels_path, "rb") as f:
            gt_rels = pickle.load(f)
        print(f"{len(gt_rels)} images with relation annotations")
    else:
        print(f"WARNING: {args.source_gt_rels_path} not found; "
              "training signal will be empty pairs")

    prd_vecs = jnp.asarray(load_predicate_vectors(args))
    n_rel = prd_vecs.shape[0]
    bs = args.batch_size
    g = cfg.TRAIN.MAX_NUM_GT_BOXES
    max_pairs = args.max_pairs

    # gt_truncate="first": relation triples index the ORIGINAL annotation
    # order, so crowded images must keep the first g boxes in order (a
    # random permute+truncate would silently corrupt the pair labels)
    loader = DetectionLoader(roidb, idx, cfg, bs, training=True,
                             seed=cfg.RNG_SEED, gt_truncate="first")
    steps_per_epoch = len(loader)

    dtype = jnp.dtype(cfg.COMPUTE_DTYPE)
    trunk = (VGG16Trunk(dtype=dtype) if args.net == "vgg16"
             else ResNetTrunk(depth=int(args.net[3:]), dtype=dtype))
    model = SGGModel(trunk=trunk,
                     vrd=VRDHead(emb_dim=args.emb_dim,
                                 spatial_type=args.spatial_type,
                                 use_obj_visual=args.use_obj_visual,
                                 fc_dim=args.vrd_fc_dim,
                                 pooling=args.vrd_pooling),
                     n_rel=n_rel)
    # eager param/opt init on the axon backend is one tunnel RPC per op
    # (tools/trainval_det_da.py has the measurement) — pin setup to the
    # host CPU backend; replicate() ships the tree to the mesh in one put
    cpu_init = None
    if jax.default_backend() != "cpu":
        try:
            cpu_init = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu_init = None
    if cpu_init is not None:
        jax.config.update("jax_default_device", cpu_init)
    z = jnp.zeros
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        z((1, 128, 160, 3)), jnp.asarray([128, 160, 1.0]), z((g, 4)),
        z((g,), jnp.int32), z((max_pairs,), jnp.int32),
        z((max_pairs,), jnp.int32), z((max_pairs,), bool), prd_vecs)["params"]

    if args.load_name not in ("", "models"):
        ld = os.path.dirname(args.load_name)
        ls = int(os.path.basename(args.load_name))
        params = restore_sgg_init(ld, ls, params)
        print(f"trunk restored from Stage-A checkpoint {args.load_name}")

    # reference decays vrd_lr by 0.9 every epoch (scripts/SGG_emb_resnet.sh);
    # the step counter only advances on effective (pair-bearing) updates,
    # so anchor the decay on that count (--decay_spe when the caller knows
    # the pair-bearing image count, else the loader length)
    decay_spe = args.decay_spe or steps_per_epoch

    def schedule(step):
        return args.vrd_lr * (0.9 ** (step // max(decay_spe, 1)))

    tx = sgg_optimizer(schedule, cfg)
    state = create_train_state(params, tx)
    if cpu_init is not None:
        jax.config.update("jax_default_device", None)
    # data axis must divide the global batch; default to the largest
    # device count that does
    import math
    mesh = make_mesh(args.mesh or math.gcd(bs, len(jax.devices())))
    state = replicate(state, mesh)
    step_fn = make_sgg_train_step(model, tx)

    ckpt_dir = os.path.join(args.save_dir, args.net,
                            f"{args.dataset}_SGG", f"session_{args.session}")
    logger = MetricsLogger(args.tfb_path or os.path.join(ckpt_dir, "logs"),
                           args.use_tfboard)
    timer = StepTimer()
    key = jax.random.PRNGKey(cfg.RNG_SEED)
    step_i = 0

    with mesh:
        for epoch in range(args.start_epoch, args.max_epochs + 1):
            for batch in loader:
                b = batch["image"].shape[0]
                ix1 = np.zeros((b, max_pairs), np.int32)
                ix2 = np.zeros((b, max_pairs), np.int32)
                labels = np.zeros((b, max_pairs, n_rel), np.float32)
                valid = np.zeros((b, max_pairs), bool)
                for bi, ridx in enumerate(batch["indices"]):
                    index = os.path.splitext(os.path.basename(
                        roidb[int(ridx)]["image"]))[0]
                    rels = gt_rels.get(index, [])
                    n = int(batch["num_boxes"][bi])
                    ix1[bi], ix2[bi], labels[bi], valid[bi] = \
                        build_pair_batch(rels, n, max_pairs, n_rel)
                if not valid.any():
                    # no relation annotations in this batch: the reference
                    # has no loss to compute for such images — skip without
                    # consuming a step (keeps effective-update counts and
                    # the lr schedule aligned with pair-bearing data)
                    continue
                sgg_batch = shard_batch({
                    "image": batch["image"], "im_info": batch["im_info"],
                    "obj_boxes": batch["gt_boxes"][:, :, :4],
                    "ix1": ix1, "ix2": ix2, "pair_valid": valid,
                    "rel_labels": labels}, mesh)
                state, metrics = step_fn(state, sgg_batch, prd_vecs,
                                         jax.random.fold_in(key, step_i))
                step_i += 1
                timer.tick(b)
                if step_i % args.disp_interval == 0:
                    m = {k: float(v) for k, v in
                         jax.device_get(metrics).items()}
                    m["imgs_per_sec"] = timer.rate()
                    logger.log_scalars("sgg_train", m, step_i)
                    print(f"[epoch {epoch:2d}][iter {step_i:6d}] "
                          f"rel loss: {m['loss']:.4f} "
                          f"pairs {int(m['n_pairs'])} "
                          f"({m['imgs_per_sec']:.1f} img/s)")
                if args.max_steps and step_i >= args.max_steps:
                    break
            save_checkpoint(ckpt_dir, state, step_i, metadata={
                "session": args.session, "epoch": epoch, "stage": "sgg",
                "net": args.net, "num_relations": int(n_rel),
                "emb_dim": args.emb_dim, "spatial_type": args.spatial_type,
                # eval/serve must build the head with the SAME pooling the
                # weights were trained on (like the reference's pooling_mode
                # travelling inside checkpoints, trainval_…:421-434)
                "vrd_pooling": args.vrd_pooling},
                keep_last=args.keep_ckpts or None)
            print(f"checkpoint @ step {step_i} (epoch {epoch})")
            if args.max_steps and step_i >= args.max_steps:
                break
    logger.close()
    return state


if __name__ == "__main__":
    main()
