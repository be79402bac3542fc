"""Fused serving pipeline: detection post-processing + det->SGG inference.

The reference's eval path (``test_net_instance_styleD_bilinear.py:133-228``)
decodes boxes, runs per-class NMS on the CPU in a Python loop, and caps at
100 detections per image; the SGG eval (``test_net_SGG_emb.py:158-289``)
then crosses detections into pairs and scores predicates frame by frame.

Here the entire per-frame pipeline — backbone, proposals, heads, per-class
NMS, top-K cap, pair enumeration, union/dual-mask features, and predicate
scoring — is ONE jitted XLA program per frame batch. Only the final packed
detections/relation tuples land on host. Everything is static-shaped:

* detections padded to ``max_det`` per image with validity masks,
* pairs padded to ``max_det * (max_det - 1)``.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.ops.boxes import decode_boxes, clip_boxes
from i2vsgg_tpu.ops.nms import nms_indices_unsorted


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (B, K, 4) in ORIGINAL image coords
    scores: jnp.ndarray   # (B, K)
    classes: jnp.ndarray  # (B, K) int32
    valid: jnp.ndarray    # (B, K) bool


def decode_detections(rois, roi_valid, cls_prob, bbox_pred, im_info, cfg:
                      Config, *, class_agnostic: bool = False,
                      max_det: int = 100, max_per_class: int = 50,
                      score_thresh: float = 0.0) -> Detections:
    """On-device bbox decode + per-class NMS + per-image top-K.
    [test_net_instance_styleD_bilinear.py:143-221]

    Args:
      rois: (B, N, 5); roi_valid: (B, N).
      cls_prob: (B, N, C); bbox_pred: (B, N, 4C) or (B, N, 4).
      im_info: (B, 3) [h, w, scale] — boxes are rescaled back by 1/scale.
    """
    b, n, c = cls_prob.shape
    stds = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS)
    means = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS)

    def one_image(rois_i, valid_i, prob_i, deltas_i, info_i):
        boxes = rois_i[:, 1:5]
        if cfg.TEST.BBOX_REG:
            k = deltas_i.shape[-1] // 4
            d = deltas_i.reshape(n, k, 4) * stds + means
            pred = decode_boxes(boxes[:, None, :].repeat(k, 1),
                                d.reshape(n * k, 4).reshape(n, k, 4))
            pred = clip_boxes(pred.reshape(n, k * 4), info_i[:2]).reshape(n, k, 4)
        else:
            pred = boxes[:, None, :].repeat(
                1 if class_agnostic else c, 1)
        pred = pred / info_i[2]                       # back to original scale

        def per_class(j):
            scores_j = prob_i[:, j]
            boxes_j = pred[:, 0] if class_agnostic else pred[:, j]
            ok = valid_i & (scores_j > score_thresh)
            # sort-free variant: the full argsort dominated at n ~ 300
            keep, kv = nms_indices_unsorted(boxes_j, scores_j, cfg.TEST.NMS,
                                            max_out=max_per_class, valid=ok)
            safe = jnp.maximum(keep, 0)
            return boxes_j[safe], scores_j[safe] * kv, kv

        cls_ids = jnp.arange(1, c)                    # skip background
        boxes_c, scores_c, valid_c = jax.vmap(
            per_class)(cls_ids)                       # (C-1, K, ...)
        flat_boxes = boxes_c.reshape(-1, 4)
        flat_scores = jnp.where(valid_c, scores_c, -1.0).reshape(-1)
        flat_cls = jnp.repeat(cls_ids, max_per_class)
        flat_valid = valid_c.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat_scores, max_det)
        return (flat_boxes[top_idx], top_scores, flat_cls[top_idx],
                flat_valid[top_idx] & (top_scores > 0))

    out = jax.vmap(one_image)(rois, roi_valid, cls_prob, bbox_pred, im_info)
    return Detections(*out)


def make_pair_indices(max_det: int) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (i != j) of detection slots.
    [faster_rcnn_SGG_emb.py:597-606]"""
    ix1, ix2 = [], []
    for i in range(max_det):
        for j in range(max_det):
            if i != j:
                ix1.append(i)
                ix2.append(j)
    return np.asarray(ix1, np.int32), np.asarray(ix2, np.int32)


def make_union_dedup(ix1: np.ndarray, ix2: np.ndarray):
    """(iu1, iu2, u_map) for a STATIC pair layout: unordered union list +
    the pair->union row map. union(i, j) == union(j, i), so pooling one
    union per unordered pair is exact at half the work."""
    slot = {}
    iu1, iu2, u_map = [], [], []
    for i, j in zip(ix1.tolist(), ix2.tolist()):
        key = (min(i, j), max(i, j))
        if key not in slot:
            slot[key] = len(iu1)
            iu1.append(key[0])
            iu2.append(key[1])
        u_map.append(slot[key])
    return (np.asarray(iu1, np.int32), np.asarray(iu2, np.int32),
            np.asarray(u_map, np.int32))


def make_frame_program(det_model, det_params, sgg_model, sgg_params,
                       prd_vecs, cfg: Config, *, max_det: int = 16,
                       max_per_class: int = 8):
    """Build the fused det+SGG per-frame program.

    Returns a jitted fn: (images (B,H,W,3), im_info (B,3)) -> dict of
    detections + per-pair predicate probabilities, all padded/masked.
    """
    ix1_np, ix2_np = make_pair_indices(max_det)
    pair_static = make_union_dedup(ix1_np, ix2_np)
    prd = jnp.asarray(prd_vecs)
    from i2vsgg_tpu.models.sgg import SGGModel

    # Params enter as traced jit arguments — closing over them would bake
    # every weight in as an XLA constant and send compile time through the
    # roof (constant folding over ResNet-101's tensors).
    @jax.jit
    def _program(det_params, sgg_params, images, im_info):
        out = det_model.apply({"params": det_params}, images, im_info,
                              mode="inference")
        dets = decode_detections(out["rois"], out["roi_valid"],
                                 out["cls_prob"], out["bbox_pred"], im_info,
                                 cfg, max_det=max_det,
                                 max_per_class=max_per_class)
        ix1 = jnp.asarray(ix1_np)
        ix2 = jnp.asarray(ix2_np)

        def one_frame(base_feat, info, boxes, valid):
            # SGG operates at input scale; detections are original-scale.
            # The trunk ran ONCE in the detector pass; the relation head
            # reuses its feature map (the reference recomputes the same
            # frozen backbone per stage, faster_rcnn_SGG_emb.py:60).
            boxes_in = boxes * info[2]
            pair_valid = valid[ix1] & valid[ix2]
            res = sgg_model.apply(
                {"params": sgg_params}, base_feat[None], info, boxes_in,
                ix1, ix2, pair_valid, prd, pair_static=pair_static,
                deterministic=True, method=SGGModel.head_on_features)
            rel_prob = jax.nn.softmax(res["scores"], axis=-1)
            return rel_prob, pair_valid

        rel_prob, pair_valid = jax.vmap(one_frame)(
            out["base_feat"], im_info, dets.boxes, dets.valid)
        return {
            "boxes": dets.boxes, "scores": dets.scores,
            "classes": dets.classes, "det_valid": dets.valid,
            "rel_prob": rel_prob, "pair_valid": pair_valid,
            "ix1": ix1, "ix2": ix2,
        }

    def frame_program(images, im_info):
        return _program(det_params, sgg_params, images, im_info)

    return frame_program


def make_bucketed_program(det_model, det_params, sgg_model, sgg_params,
                          prd_vecs, cfg: Config, *,
                          buckets: tuple = (4, 8, 16),
                          max_per_class: int = 8):
    """Detection-count pair bucketing: 240 scored pairs at max_det=16 is
    the WORST case — typical frames have far fewer valid detections, and
    pair cost grows ~quadratically. This splits the fused program in two:

    1. a detection program (backbone -> proposals -> decode/NMS) that
       also emits the per-batch max detection count as a scalar,
    2. one SGG head program per bucket size (compiled lazily), fed the
       on-device feature map + detections.

    Per batch the smallest bucket >= the actual max count runs. Exactness:
    a pair valid in bucket b is scored identically in every bucket >= b
    (same head on the same features; only padding differs). Costs one
    tiny scalar fetch per batch between the two programs.
    """
    from i2vsgg_tpu.models.sgg import SGGModel
    prd = jnp.asarray(prd_vecs)
    buckets = tuple(sorted(buckets))
    max_det = buckets[-1]

    @jax.jit
    def _det(det_params, images, im_info):
        out = det_model.apply({"params": det_params}, images, im_info,
                              mode="inference")
        dets = decode_detections(out["rois"], out["roi_valid"],
                                 out["cls_prob"], out["bbox_pred"], im_info,
                                 cfg, max_det=max_det,
                                 max_per_class=max_per_class)
        n_max = jnp.max(jnp.sum(dets.valid.astype(jnp.int32), axis=1))
        return out["base_feat"], dets, n_max

    _sgg_cache: Dict[int, object] = {}

    def _sgg_for(b: int):
        if b in _sgg_cache:
            return _sgg_cache[b]
        ix1_np, ix2_np = make_pair_indices(b)
        pair_static = make_union_dedup(ix1_np, ix2_np)
        ix1 = jnp.asarray(ix1_np)
        ix2 = jnp.asarray(ix2_np)

        @jax.jit
        def _sgg(sgg_params, base_feat, im_info, boxes, valid):
            def one_frame(feat, info, bx, vl):
                boxes_in = bx * info[2]
                pair_valid = vl[ix1] & vl[ix2]
                res = sgg_model.apply(
                    {"params": sgg_params}, feat[None], info, boxes_in,
                    ix1, ix2, pair_valid, prd, pair_static=pair_static,
                    deterministic=True, method=SGGModel.head_on_features)
                return jax.nn.softmax(res["scores"], -1), pair_valid
            rel_prob, pair_valid = jax.vmap(one_frame)(
                base_feat, im_info, boxes, valid)
            return rel_prob, pair_valid

        _sgg_cache[b] = (_sgg, ix1, ix2)
        return _sgg_cache[b]

    def frame_program(images, im_info):
        base_feat, dets, n_max = _det(det_params, images, im_info)
        n = int(jax.device_get(n_max))            # tiny scalar fetch
        b = next((x for x in buckets if x >= n), max_det)
        _sgg, ix1, ix2 = _sgg_for(b)
        rel_prob, pair_valid = _sgg(sgg_params, base_feat, im_info,
                                    dets.boxes[:, :b], dets.valid[:, :b])
        return {
            "boxes": dets.boxes, "scores": dets.scores,
            "classes": dets.classes, "det_valid": dets.valid,
            "rel_prob": rel_prob, "pair_valid": pair_valid,
            "ix1": ix1, "ix2": ix2, "bucket": b,
        }

    return frame_program
