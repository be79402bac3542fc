"""Training-target assignment: RPN anchor targets and RoI proposal targets.

TPU-native reimplementation of ``lib/model/rpn/anchor_target_layer.py:31-219``
and ``lib/model/rpn/proposal_target_layer_cascade.py:20-212``. The reference's
per-image Python loops, ``np.random`` calls, and index-compaction
(inside-anchor filtering, ``torch.nonzero``) are replaced with fully masked
static-shape computations and deterministic ``jax.random`` keys:

* inside-image anchors are a mask, not a gather — outside anchors simply stay
  at label -1 / weight 0 (equivalent to the reference's unmap-with-fill).
* random subsampling draws a uniform priority per candidate and keeps the
  top-k by priority — a PRNG-keyed equivalent of ``np.random.permutation``.
* "sample with replacement" paths use cumsum-ranked candidate lookup.

Everything is per-image; batching is ``vmap`` at the call site.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from i2vsgg_tpu.ops.boxes import encode_boxes, pairwise_iou_padded


def _deterministic() -> bool:
    """I2VSGG_DETERMINISTIC_SAMPLING=1 makes every subsample take the
    FIRST k candidates in index order (and with-replacement draws cycle
    0..k-1). The torch reference admits the same derandomization by
    patching np.random (parity/refshim.patch_deterministic_sampling) —
    together they make gradients directly comparable across arms
    (tools/grad_parity.py). Read at TRACE time; not for production."""
    import os
    return os.environ.get("I2VSGG_DETERMINISTIC_SAMPLING") == "1"


def _keep_topk_random(key, candidate_mask: jnp.ndarray, k) -> jnp.ndarray:
    """Randomly keep at most ``k`` True entries of ``candidate_mask``.

    Assigns each candidate a uniform priority and keeps the k highest —
    distributionally equivalent to ``np.random.permutation(n)[:k]``
    [anchor_target_layer.py:131-147]. ``k`` may be traced.
    """
    n = candidate_mask.shape[0]
    if _deterministic():
        rank = jnp.cumsum(candidate_mask.astype(jnp.int32)) - 1
        return candidate_mask & (rank < k)
    r = jax.random.uniform(key, (n,))
    pri = jnp.where(candidate_mask, r, -1.0)
    order = jnp.argsort(-pri)                      # candidates first
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return candidate_mask & (rank < k)


def _sample_with_replacement(key, candidate_mask: jnp.ndarray, k: int):
    """Draw ``k`` indices uniformly (with replacement) from the True entries.

    Replicates ``np.floor(rand(k) * n_cand)`` indexing into the nonzero list
    [proposal_target_layer_cascade.py:163-190]. Returns (k,) int32 indices
    (arbitrary when no candidate exists — caller must mask).
    """
    n = candidate_mask.shape[0]
    # stable argsort: False(0) sorts after True(1) when negated keys used
    order = jnp.argsort(~candidate_mask)           # candidates first, in order
    n_cand = jnp.sum(candidate_mask)
    if _deterministic():
        # floor((i+0.5)/k * n): what the reference computes when its
        # np.random.rand(k) is patched to (arange(k)+0.5)/k
        draw = jnp.floor((jnp.arange(k) + 0.5) / k
                         * n_cand).astype(jnp.int32)
    else:
        draw = jnp.floor(jax.random.uniform(key, (k,)) * n_cand).astype(jnp.int32)
    draw = jnp.clip(draw, 0, jnp.maximum(n_cand - 1, 0))
    return order[draw]


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray            # (N,) int32 in {-1, 0, 1}
    bbox_targets: jnp.ndarray      # (N, 4)
    inside_weights: jnp.ndarray    # (N,) scalar weight (broadcast to 4)
    outside_weights: jnp.ndarray   # (N,)


def anchor_targets(key, anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   im_info: jnp.ndarray, *,
                   positive_overlap: float = 0.7,
                   negative_overlap: float = 0.3,
                   clobber_positives: bool = False,
                   fg_fraction: float = 0.5,
                   batch_size: int = 256) -> AnchorTargets:
    """Per-image anchor target assignment. [anchor_target_layer.py:48-205]

    Args:
      anchors: (N, 4) all anchors (full grid).
      gt_boxes: (K, 5) zero-padded [x1, y1, x2, y2, cls].
      im_info: (3,) [h, w, scale].
    """
    n = anchors.shape[0]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_info[1]) & (anchors[:, 3] < im_info[0]))

    overlaps = pairwise_iou_padded(anchors, gt_boxes)        # (N, K)
    # outside anchors never participate (reference filters them out entirely)
    overlaps = jnp.where(inside[:, None], overlaps, -1.0)
    max_ov = jnp.max(overlaps, axis=1)                       # (N,)
    argmax_ov = jnp.argmax(overlaps, axis=1)
    gt_max = jnp.max(overlaps, axis=0)                       # (K,)
    gt_max = jnp.where(gt_max == 0.0, 1e-5, gt_max)
    is_best_for_gt = jnp.any(overlaps == gt_max[None, :], axis=1)

    labels = jnp.full((n,), -1, jnp.int32)
    if not clobber_positives:
        labels = jnp.where(inside & (max_ov < negative_overlap), 0, labels)
    labels = jnp.where(inside & is_best_for_gt, 1, labels)
    labels = jnp.where(inside & (max_ov >= positive_overlap), 1, labels)
    if clobber_positives:
        labels = jnp.where(inside & (max_ov < negative_overlap), 0, labels)

    # subsample: at most num_fg positives, then fill to batch_size with negs
    num_fg = int(fg_fraction * batch_size)
    kf, kb = jax.random.split(key)
    fg_keep = _keep_topk_random(kf, labels == 1, num_fg)
    labels = jnp.where((labels == 1) & ~fg_keep, -1, labels)
    num_bg = batch_size - jnp.sum(labels == 1)
    bg_keep = _keep_topk_random(kb, labels == 0, num_bg)
    labels = jnp.where((labels == 0) & ~bg_keep, -1, labels)

    # regression targets toward each anchor's argmax gt (computed for all
    # inside anchors, like the reference)
    tgt = encode_boxes(anchors, gt_boxes[argmax_ov, :4])
    tgt = jnp.where(inside[:, None], tgt, 0.0)

    inside_w = (labels == 1).astype(jnp.float32)
    num_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
    outside_w = (labels >= 0).astype(jnp.float32) / num_examples
    return AnchorTargets(labels, tgt, inside_w, outside_w)


class RoiTargets(NamedTuple):
    rois: jnp.ndarray              # (S, 5) [batch_idx, x1, y1, x2, y2]
    labels: jnp.ndarray            # (S,) int32 class labels (0 = bg)
    bbox_targets: jnp.ndarray      # (S, 4) normalized, class-selected
    inside_weights: jnp.ndarray    # (S, 4)
    outside_weights: jnp.ndarray   # (S, 4)


def proposal_targets(key, rois: jnp.ndarray, roi_valid: jnp.ndarray,
                     gt_boxes: jnp.ndarray, batch_idx, *,
                     rois_per_image: int = 128,
                     fg_fraction: float = 0.25,
                     fg_thresh: float = 0.5,
                     bg_thresh_hi: float = 0.5,
                     bg_thresh_lo: float = 0.1,
                     bbox_normalize_means=(0.0, 0.0, 0.0, 0.0),
                     bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
                     bbox_inside_weights=(1.0, 1.0, 1.0, 1.0)) -> RoiTargets:
    """Per-image RoI sampling + regression targets.
    [proposal_target_layer_cascade.py:33-212]

    Args:
      rois: (R, 5) RPN proposals (zero-padded).
      roi_valid: (R,) bool.
      gt_boxes: (K, 5) zero-padded [x1, y1, x2, y2, cls]; appended to the
        candidate set like the reference (`:39-43`).
    """
    k = gt_boxes.shape[0]
    gt_rois = jnp.concatenate(
        [jnp.full((k, 1), jnp.asarray(batch_idx, gt_boxes.dtype)),
         gt_boxes[:, :4]], axis=1)
    gt_valid = jnp.any(gt_boxes[:, :4] != 0.0, axis=1)
    all_rois = jnp.concatenate([rois, gt_rois], axis=0)       # (R+K, 5)
    all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    overlaps = pairwise_iou_padded(all_rois[:, 1:5], gt_boxes)  # (R+K, K)
    overlaps = jnp.where(all_valid[:, None], overlaps, -1.0)
    max_ov = jnp.max(overlaps, axis=1)
    gt_assign = jnp.argmax(overlaps, axis=1)
    cand_labels = gt_boxes[gt_assign, 4].astype(jnp.int32)

    fg_mask = all_valid & (max_ov >= fg_thresh)
    bg_mask = all_valid & (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo)
    n_fg = jnp.sum(fg_mask)
    n_bg = jnp.sum(bg_mask)

    fg_per_img = max(1, int(round(fg_fraction * rois_per_image)))
    kf, kb, kf2, kb2 = jax.random.split(key, 4)

    # --- case 1: both fg and bg present [:156-171] ---------------------
    # fg: up to fg_per_img without replacement; bg: fill the rest with
    # replacement. Build a sampled index list of length rois_per_image.
    fg_keep = _keep_topk_random(kf, fg_mask, jnp.minimum(fg_per_img, n_fg))
    n_fg_kept = jnp.sum(fg_keep)
    order_fg = jnp.argsort(~fg_keep)                         # kept fg first
    bg_draw = _sample_with_replacement(kb, bg_mask, rois_per_image)
    pos = jnp.arange(rois_per_image)
    idx_case1 = jnp.where(pos < n_fg_kept, order_fg[pos],
                          bg_draw)  # bg_draw reused positionally is fine (iid)
    lbl_case1 = jnp.where(pos < n_fg_kept, cand_labels[idx_case1], 0)

    # --- case 2: only fg [:173-181] — all slots fg, with replacement ----
    fg_draw = _sample_with_replacement(kf2, fg_mask, rois_per_image)
    lbl_case2 = cand_labels[fg_draw]

    # --- case 3: only bg [:182-193] — all slots bg, with replacement ----
    bg_draw3 = _sample_with_replacement(kb2, bg_mask, rois_per_image)
    lbl_case3 = jnp.zeros((rois_per_image,), jnp.int32)

    both = (n_fg > 0) & (n_bg > 0)
    only_fg = (n_fg > 0) & (n_bg == 0)
    sel = jnp.where(both, idx_case1, jnp.where(only_fg, fg_draw, bg_draw3))
    labels = jnp.where(both, lbl_case1, jnp.where(only_fg, lbl_case2, lbl_case3))

    out_rois = all_rois[sel].at[:, 0].set(jnp.asarray(batch_idx, all_rois.dtype))
    sel_gt = gt_boxes[gt_assign[sel], :4]
    tgt = encode_boxes(out_rois[:, 1:5], sel_gt)
    means = jnp.asarray(bbox_normalize_means)
    stds = jnp.asarray(bbox_normalize_stds)
    tgt = (tgt - means) / stds

    fg_sel = labels > 0
    in_w = jnp.where(fg_sel[:, None], jnp.asarray(bbox_inside_weights), 0.0)
    out_w = (in_w > 0).astype(jnp.float32)
    tgt = jnp.where(fg_sel[:, None], tgt, 0.0)
    return RoiTargets(out_rois, labels, tgt, in_w, out_w)
