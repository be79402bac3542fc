#!/usr/bin/env python
"""SGG evaluation + video association + vIoU relation metrics.

Rebuild of ``test_net_SGG_emb.py:42-326`` (the shipped driver has broken
imports — SURVEY.md §8.2): per frame, the target's GT boxes act as
detections (the reference's ``forward_relation`` eval branch,
``faster_rcnn_SGG_emb.py:583-587``), all ordered pairs are predicate-scored
in one jitted program, ``detection_output`` packs top-100 (pair, predicate)
tuples, frames are grouped per video, gap-filled + greedily associated into
relation trajectories, and scored with vIoU mAP / R@50/100 / tagging P@K.

Frame -> (video, frame_no) mapping: ``--frame_map`` pickle
(``data/VidOR/map.pkl`` in the reference, ``faster_rcnn_SGG_emb.py:50``),
else parsed from the image index as ``<video>_<frame_no>``.

Usage:
  python tools/test_sgg.py --dataset MVidVRD --net res101 \
      --load_name models/res101/MVRD_SGG/session_1/<step> \
      --video_ann data/MVidVRD/video_annotations_static.json
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def frame_key(index: str, frame_map):
    if frame_map is not None and index in frame_map:
        vid, fno = frame_map[index]
        return str(vid), int(fno)
    if "_" in index:
        vid, fno = index.rsplit("_", 1)
        try:
            return vid, int(fno)
        except ValueError:
            pass
    return index, 0


def main(argv=None):
    from tools.trainval_sgg import load_predicate_vectors
    from i2vsgg_tpu.cli.args import parse_args, set_dataset_args
    args = set_dataset_args(parse_args(argv), test=True)

    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config, cfg_from_list
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.models.backbones import ResNetTrunk, VGG16Trunk
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.serve import make_pair_indices, make_union_dedup
    from i2vsgg_tpu.train.checkpoint import (load_metadata,
                                             restore_intersection)
    from i2vsgg_tpu.video.association import association
    from i2vsgg_tpu.video.metrics import (detection_output, evaluate,
                                          evaluate_recognition,
                                          recognition_output)

    base_cfg = Config()
    if os.path.exists(getattr(args, "cfg_file", "")):
        from i2vsgg_tpu.config import cfg_from_file
        base_cfg = cfg_from_file(args.cfg_file, base_cfg)
        print(f"loaded config {args.cfg_file}")
    cfg = cfg_from_list(args.set_cfgs + args.extra_cfgs, base_cfg).replace(
        COMPUTE_DTYPE=args.compute_dtype)

    imdb, roidb, _, idx = combined_roidb(args.imdbval_name, training=False,
                                         use_flipped=False)
    print(f"{len(roidb)} eval frames ({args.imdbval_name})")
    # gt_truncate="first": GT-pair recognition indexes the original
    # annotation order (see trainval_sgg.py); only applies when n > g
    loader = DetectionLoader(roidb, idx, cfg, batch_size=args.batch_size,
                             training=False, gt_truncate="first")

    prd_vecs = jnp.asarray(load_predicate_vectors(args))
    n_rel = prd_vecs.shape[0]
    g = cfg.TRAIN.MAX_NUM_GT_BOXES
    ix1_np, ix2_np = make_pair_indices(g)
    max_pairs = len(ix1_np)

    # pooling mode must match what the checkpoint was trained with
    # (reference: pooling_mode travels inside checkpoints and overrides cfg,
    # test_net_instance_styleD_bilinear.py:80-81)
    vrd_pooling = args.vrd_pooling
    if args.load_name not in ("", "models"):
        try:
            meta = load_metadata(os.path.dirname(args.load_name),
                                 int(os.path.basename(args.load_name)))
            if "vrd_pooling" in meta:
                vrd_pooling = meta["vrd_pooling"]
                print(f"vrd pooling from checkpoint metadata: {vrd_pooling}")
        except FileNotFoundError:
            pass

    dtype = jnp.dtype(cfg.COMPUTE_DTYPE)
    trunk = (VGG16Trunk(dtype=dtype) if args.net == "vgg16"
             else ResNetTrunk(depth=int(args.net[3:]), dtype=dtype))
    model = SGGModel(trunk=trunk,
                     vrd=VRDHead(emb_dim=args.emb_dim,
                                 spatial_type=args.spatial_type,
                                 use_obj_visual=args.use_obj_visual,
                                 fc_dim=args.vrd_fc_dim,
                                 pooling=vrd_pooling,
                                 int8_fc=args.int8_fc6),
                     n_rel=n_rel)
    # eager init on the axon backend is one tunnel RPC per op (minutes —
    # tools/trainval_det_da.py has the measurement); pin setup to the
    # host CPU backend, then device_put once
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
        {"params": jax.random.PRNGKey(0)},
        z((1, 128, 160, 3)), jnp.asarray([128, 160, 1.0]), z((g, 4)),
        z((g,), jnp.int32), z((max_pairs,), jnp.int32),
        z((max_pairs,), jnp.int32), z((max_pairs,), bool), prd_vecs)["params"]

    if args.load_name not in ("", "models"):
        ckpt_dir = os.path.dirname(args.load_name)
        step = int(os.path.basename(args.load_name))
        params = restore_intersection(ckpt_dir, step, params)
        print(f"loaded {args.load_name}")
    if cpu_init is not None:
        jax.config.update("jax_default_device", None)
    params = jax.device_put(params, jax.devices()[0])
    # commit once (host numpy would re-upload per jitted call)

    frame_map = None
    if args.frame_map and os.path.exists(args.frame_map):
        with open(args.frame_map, "rb") as f:
            frame_map = pickle.load(f)

    ix1 = jnp.asarray(ix1_np)
    ix2 = jnp.asarray(ix2_np)

    # static all-pairs layout -> unordered-union dedup (exact, ~2x cheaper)
    pair_static = make_union_dedup(ix1_np, ix2_np)

    @jax.jit
    def score_frames(params, images, im_info, boxes, nbox):
        def one(img, info, bx, n):
            pv = (ix1 < n) & (ix2 < n)
            out = model.apply({"params": params}, img[None], info, bx,
                              jnp.zeros((g,), jnp.int32), ix1, ix2, pv,
                              prd_vecs, pair_static=pair_static)
            return jax.nn.softmax(out["scores"], -1), pv
        return jax.vmap(one)(images, im_info, boxes, nbox)

    # recognition task (vrd_task=pre_det): GT pairs, predicate scores fused
    # with the log so-prior [lib/utils.py:570-582]; sub/obj scores are the
    # GT one-hots (the reference driver's detector-score path is incoherent
    # as shipped — SURVEY.md §8.6 — so GT classification is the canonical
    # recognition setting)
    recognition = args.vrd_task == "pre_det"
    gt_rels = {}
    so_prior = None
    if recognition:
        if os.path.exists(args.target_gt_rels_path):
            with open(args.target_gt_rels_path, "rb") as f:
                gt_rels = pickle.load(f)
        if os.path.exists(args.source_so_prior_path):
            with open(args.source_so_prior_path, "rb") as f:
                so_prior = pickle.load(f)
    n_cls = len(imdb.classes)
    recognition_preds = {}

    frame_detections = {}
    t0 = time.time()
    done = 0
    for batch in loader:
        # GT boxes as detections, input scale -> original scale for output
        rel_prob, pv = score_frames(
            params, jnp.asarray(batch["image"]),
            jnp.asarray(batch["im_info"]),
            jnp.asarray(batch["gt_boxes"][:, :, :4]),
            jnp.asarray(batch["num_boxes"]))
        rel_prob = np.asarray(jax.device_get(rel_prob))
        pv = np.asarray(jax.device_get(pv))
        for bi, ridx in enumerate(batch["indices"]):
            entry = roidb[int(ridx)]
            index = os.path.splitext(os.path.basename(entry["image"]))[0]
            vid, fno = frame_key(index, frame_map)
            n = int(batch["num_boxes"][bi])
            scale = float(batch["im_info"][bi, 2])
            boxes = batch["gt_boxes"][bi, :n, :4] / scale
            classes = batch["gt_boxes"][bi, :n, 4].astype(int)
            confs = np.ones((n,), np.float32)
            sel = pv[bi]
            out = detection_output(rel_prob[bi][sel], boxes, classes, confs,
                                   ix1_np[sel], ix2_np[sel], top_k=100)
            tuples = []
            if out is not None:
                rlp, tconfs, sboxes, oboxes, _ = out
                k = int((tconfs > 0).sum()) if len(tconfs) else 0
                for t in range(min(100, len(tconfs))):
                    tuples.append([float(tconfs[t]),
                                   [int(c) for c in rlp[t]],
                                   [sboxes[t].tolist(), oboxes[t].tolist()],
                                   t])
            frame_detections.setdefault(vid, []).append([fno, tuples])
            if recognition:
                # raw cosine scores for GT pairs + so-prior fusion
                raw = np.log(np.clip(rel_prob[bi], 1e-12, None))
                for (s, p, o) in gt_rels.get(index, []):
                    if s >= n or o >= n:
                        continue
                    pair_slots = np.where((ix1_np == s) & (ix2_np == o))[0]
                    if not len(pair_slots) or not pv[bi][pair_slots[0]]:
                        continue
                    sc, oc = int(classes[s]), int(classes[o])
                    sub_s = np.zeros(n_cls)
                    obj_s = np.zeros(n_cls)
                    sub_s[sc] = 1.0
                    obj_s[oc] = 1.0
                    prior = (so_prior[sc - 1, oc - 1]
                             if so_prior is not None
                             else np.full((n_rel,), 1.0 / n_rel))
                    _, _, pre_s = recognition_output(
                        sub_s[None], obj_s[None], raw[pair_slots[0]][None],
                        prior[None], n_rel)
                    recognition_preds.setdefault(vid, []).append({
                        "triplet": [sc, int(p), oc],
                        "sub_score": sub_s.tolist(),
                        "obj_score": obj_s.tolist(),
                        "pre_score": pre_s[0].tolist()})
            done += 1
        if done % 200 < args.batch_size:
            print(f"  {done} frames ({done / (time.time() - t0):.1f}/s)")

    out_dir = os.path.join(args.save_dir, "eval",
                           f"{args.imdbval_name}_SGG")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "frame_detections.json"), "w") as f:
        json.dump(frame_detections, f)
    print(f"frame detections -> {out_dir}/frame_detections.json")

    if recognition:
        with open(os.path.join(out_dir, "recognition.json"), "w") as f:
            json.dump(recognition_preds, f)
        acc = evaluate_recognition(recognition_preds,
                                   num_fg_classes=n_cls - 1)
        return acc

    video_relations = association(frame_detections,
                                  objects=list(imdb.classes),
                                  predicates=[str(i) for i in range(n_rel)])
    with open(os.path.join(out_dir, "video_relations.json"), "w") as f:
        json.dump(video_relations, f)

    if args.video_ann and os.path.exists(args.video_ann):
        with open(args.video_ann) as f:
            gt = json.load(f)
        mAP, rec_at_n, prec_at_n = evaluate(video_relations, gt)
        print(f"relation detection mAP: {mAP:.4f}")
        for k, v in rec_at_n.items():
            print(f"recall@{k}: {v:.4f}")
        for k, v in prec_at_n.items():
            print(f"tagging precision@{k}: {v:.4f}")
        return mAP, rec_at_n, prec_at_n
    print("no --video_ann given; skipping vIoU metrics")
    return video_relations


if __name__ == "__main__":
    main()
