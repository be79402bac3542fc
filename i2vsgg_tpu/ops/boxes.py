"""Pure-jnp box geometry.

TPU-native equivalents of the reference's box math, preserving its exact
``+1`` box-width conventions:

* encode/decode/clip — ``lib/model/rpn/bbox_transform.py:15-131``
* IoU (incl. padded-GT masking) — ``lib/model/rpn/bbox_transform.py:136-257``
  and the Cython ``lib/model/utils/bbox.pyx``
* union boxes / dual masks / relative location — the SGG head's spatial
  features, ``lib/model/faster_rcnn/resnet_SGG_emb.py:240-264``

All functions are shape-polymorphic pure functions (no batch loops): batching
is expressed with leading dims / ``vmap`` so XLA can fuse and tile them.
Boxes are ``[x1, y1, x2, y2]`` in pixels unless stated otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_wh(boxes: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Widths/heights under the reference's +1 convention."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w, h


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    w, h = box_wh(boxes)
    return w * h


def encode_boxes(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Box regression targets (dx, dy, dw, dh). [bbox_transform.py:15-34]

    Works for any matching leading shape: (..., 4) x (..., 4) -> (..., 4).
    """
    ex_w, ex_h = box_wh(ex_rois)
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h
    gt_w, gt_h = box_wh(gt_rois)
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply regression deltas to boxes. [bbox_transform.py:79-105]

    ``boxes``: (..., 4); ``deltas``: (..., 4*K) for K classes (or K=1).
    Returns (..., 4*K) decoded boxes.
    """
    w, h = box_wh(boxes)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    shape = deltas.shape
    k = shape[-1] // 4
    d = deltas.reshape(shape[:-1] + (k, 4))
    pred_cx = d[..., 0] * w[..., None] + cx[..., None]
    pred_cy = d[..., 1] * h[..., None] + cy[..., None]
    pred_w = jnp.exp(d[..., 2]) * w[..., None]
    pred_h = jnp.exp(d[..., 3]) * h[..., None]
    out = jnp.stack(
        [pred_cx - 0.5 * pred_w, pred_cy - 0.5 * pred_h,
         pred_cx + 0.5 * pred_w, pred_cy + 0.5 * pred_h], axis=-1)
    return out.reshape(shape)


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clamp boxes (or 4K-packed class boxes) to [0, W-1] x [0, H-1].
    [bbox_transform.py:127-135]"""
    im_hw = jnp.asarray(im_hw, dtype=boxes.dtype)
    h, w = im_hw[..., 0], im_hw[..., 1]
    shape = boxes.shape
    k = shape[-1] // 4
    b = boxes.reshape(shape[:-1] + (k, 4))
    x1 = jnp.clip(b[..., 0], 0, (w - 1)[..., None, None] if w.ndim else w - 1)
    y1 = jnp.clip(b[..., 1], 0, (h - 1)[..., None, None] if h.ndim else h - 1)
    x2 = jnp.clip(b[..., 2], 0, (w - 1)[..., None, None] if w.ndim else w - 1)
    y2 = jnp.clip(b[..., 3], 0, (h - 1)[..., None, None] if h.ndim else h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def pairwise_iou(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix with the +1 convention: (N, 4) x (K, 4) -> (N, K).
    [bbox_transform.py:136-166 / bbox.pyx]"""
    area_b = box_area(boxes)[:, None]
    area_q = box_area(query)[None, :]
    iw = (jnp.minimum(boxes[:, None, 2], query[None, :, 2])
          - jnp.maximum(boxes[:, None, 0], query[None, :, 0]) + 1.0)
    ih = (jnp.minimum(boxes[:, None, 3], query[None, :, 3])
          - jnp.maximum(boxes[:, None, 1], query[None, :, 1]) + 1.0)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    return inter / (area_b + area_q - inter)


def pairwise_iou_padded(boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU against zero-padded GT rows, with the reference's sentinel masking
    [bbox_transform.py:168-257]:

    * IoU with an all-zero GT row (the padding produced by the batch loader)
      is forced to 0.
    * IoU rows for degenerate (all-zero) candidate boxes are forced to -1 so
      padded anchors/rois never win assignments.

    ``boxes``: (N, 4); ``gt_boxes``: (K, 4) or (K, 5). Returns (N, K).
    """
    gt = gt_boxes[..., :4]
    overlaps = pairwise_iou(boxes, gt)
    gt_w, gt_h = box_wh(gt)
    box_w, box_h = box_wh(boxes)
    gt_zero = (gt_w == 1.0) & (gt_h == 1.0)        # all-zero padded rows
    box_zero = (box_w == 1.0) & (box_h == 1.0)
    overlaps = jnp.where(gt_zero[None, :], 0.0, overlaps)
    overlaps = jnp.where(box_zero[:, None], -1.0, overlaps)
    return overlaps


def union_boxes(a: jnp.ndarray, b: jnp.ndarray, im_h, im_w,
                margin: float = 10.0) -> jnp.ndarray:
    """Union box of subject/object with margin, clipped to the image.
    [resnet_SGG_emb.py:240-244] Shapes broadcast: (..., 4) x (..., 4)."""
    x1 = jnp.maximum(0.0, jnp.minimum(a[..., 0], b[..., 0]) - margin)
    y1 = jnp.maximum(0.0, jnp.minimum(a[..., 1], b[..., 1]) - margin)
    x2 = jnp.minimum(jnp.asarray(im_w, a.dtype), jnp.maximum(a[..., 2], b[..., 2]) + margin)
    y2 = jnp.minimum(jnp.asarray(im_h, a.dtype), jnp.maximum(a[..., 3], b[..., 3]) + margin)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def dual_mask(im_h, im_w, boxes: jnp.ndarray, size: int = 32) -> jnp.ndarray:
    """Rasterize boxes onto a ``size``x``size`` binary mask.
    [resnet_SGG_emb.py:246-256]

    Matches the reference exactly: x1=floor(x1*32/W) clamped >=0,
    x2=ceil(x2*32/W) clamped <=32; mask[y1:y2, x1:x2] = 1.
    ``boxes``: (..., 4) -> (..., size, size) float32.
    """
    rh = size / jnp.asarray(im_h, jnp.float32)
    rw = size / jnp.asarray(im_w, jnp.float32)
    x1 = jnp.maximum(0.0, jnp.floor(boxes[..., 0] * rw))
    x2 = jnp.minimum(float(size), jnp.ceil(boxes[..., 2] * rw))
    y1 = jnp.maximum(0.0, jnp.floor(boxes[..., 1] * rh))
    y2 = jnp.minimum(float(size), jnp.ceil(boxes[..., 3] * rh))
    ys = jnp.arange(size, dtype=jnp.float32)
    xs = jnp.arange(size, dtype=jnp.float32)
    row = (ys >= y1[..., None]) & (ys < y2[..., None])     # (..., size)
    col = (xs >= x1[..., None]) & (xs < x2[..., None])     # (..., size)
    return (row[..., :, None] & col[..., None, :]).astype(jnp.float32)


def relative_loc(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """8-dim relative location feature (spatial_type==1).
    [resnet_SGG_emb.py:258-264]"""
    sw = a[..., 2] - a[..., 0]
    sh = a[..., 3] - a[..., 1]
    ow = b[..., 2] - b[..., 0]
    oh = b[..., 3] - b[..., 1]
    xy = jnp.stack([(a[..., 0] - b[..., 0]) / ow,
                    (a[..., 1] - b[..., 1]) / oh,
                    (b[..., 0] - a[..., 0]) / sw,
                    (b[..., 1] - a[..., 1]) / sh], axis=-1)
    wh = jnp.log(jnp.stack([sw / ow, sh / oh, ow / sw, oh / sh], axis=-1))
    return jnp.concatenate([xy, wh], axis=-1)


def smooth_l1_loss(pred, targets, inside_w, outside_w, sigma: float = 1.0,
                   reduce_dims=(-1,)) -> jnp.ndarray:
    """Weighted smooth-L1 with the reference's sigma semantics
    [lib/model/utils/net_utils.py:122-136]: sum over ``reduce_dims`` then
    mean over the rest."""
    sigma2 = sigma ** 2
    diff = inside_w * (pred - targets)
    adiff = jnp.abs(diff)
    quad = (adiff < 1.0 / sigma2).astype(pred.dtype)
    loss = (diff ** 2) * (sigma2 / 2.0) * quad + (adiff - 0.5 / sigma2) * (1.0 - quad)
    loss = outside_w * loss
    loss = jnp.sum(loss, axis=tuple(reduce_dims))
    return jnp.mean(loss)
