"""Region Proposal Network: head + fully on-device proposal generation.

Reimplements ``lib/model/rpn/rpn.py:17-110`` and
``lib/model/rpn/proposal_layer.py:26-178`` TPU-natively:

* the reference's per-image Python loop + CPU NMS bounce
  (``proposal_layer.py:130-161``, ``nms_wrapper.py:20``) becomes a vmapped,
  fixed-shape on-device pipeline: decode -> clip -> top-k -> padded NMS.
* channel layout: NHWC. The 2A score channels are [bg x A | fg x A], matching
  the reference's (B, 2, A*H, W) softmax-pairing trick (``rpn.py:49-70``).
* proposals are zero-padded to ``post_nms_top_n`` with a validity mask
  (the reference zero-pads too: ``proposal_layer.py:129,158-162``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from i2vsgg_tpu.ops.boxes import decode_boxes, clip_boxes
from i2vsgg_tpu.ops.nms import nms_indices


class RPNHead(nn.Module):
    """3x3 conv + objectness / bbox-delta 1x1 convs. [rpn.py:27-36]

    All three convs init normal(0, 0.01) with zero bias, matching the
    reference's explicit head init
    [faster_rcnn_instance_styleD_bilinear.py:195-208].
    """
    num_anchors: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):
        from i2vsgg_tpu.models.inits import normal_init
        a = self.num_anchors
        ki = normal_init(0.01)
        x = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    kernel_init=ki, name="conv")(feat.astype(self.dtype))
        x = nn.relu(x)
        cls_score = nn.Conv(2 * a, (1, 1), dtype=self.dtype, kernel_init=ki,
                            name="cls_score")(x)
        bbox_pred = nn.Conv(4 * a, (1, 1), dtype=self.dtype, kernel_init=ki,
                            name="bbox_pred")(x)
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


def rpn_softmax_fg(cls_score: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """(B, H, W, 2A) scores -> (B, H, W, A) fg probabilities, pairing bg
    channel a with fg channel A+a. [rpn.py:66-70]

    softmax([bg, fg])[fg] == sigmoid(fg - bg), but the sigmoid form is
    overflow-safe for large logits (exp(fg)/(exp(bg)+exp(fg)) -> inf/inf
    -> NaN for logits >~88 in fp32, which a confident trained RPN can emit).
    """
    bg = cls_score[..., :num_anchors]
    fg = cls_score[..., num_anchors:]
    return jax.nn.sigmoid(fg - bg)


class Proposals(NamedTuple):
    rois: jnp.ndarray      # (B, N, 5) [batch_idx, x1, y1, x2, y2], zero-padded
    valid: jnp.ndarray     # (B, N) bool


def generate_proposals(fg_probs: jnp.ndarray, bbox_deltas: jnp.ndarray,
                       im_info: jnp.ndarray, anchors: jnp.ndarray,
                       pre_nms_top_n: int, post_nms_top_n: int,
                       nms_thresh: float) -> Proposals:
    """Proposal generation. [proposal_layer.py:48-170]

    Args:
      fg_probs: (B, H, W, A) foreground probabilities.
      bbox_deltas: (B, H, W, 4A).
      im_info: (B, 3) [height, width, scale] of the padded input images.
      anchors: (H*W*A, 4) from ``ops.anchors.shifted_anchors``.
    """
    b = fg_probs.shape[0]
    n = anchors.shape[0]
    scores = fg_probs.reshape(b, n)
    deltas = bbox_deltas.reshape(b, n, 4)

    def one_image(scores_i, deltas_i, info_i, batch_idx):
        proposals = decode_boxes(anchors, deltas_i)          # (N, 4)
        proposals = clip_boxes(proposals, info_i[:2])
        k = min(pre_nms_top_n, n)
        top_scores, top_idx = jax.lax.top_k(scores_i, k)
        top_boxes = proposals[top_idx]
        # top_k already returns score-descending candidates
        keep, keep_valid = nms_indices(top_boxes, top_scores, nms_thresh,
                                       max_out=post_nms_top_n, presorted=True)
        safe = jnp.maximum(keep, 0)
        rois4 = jnp.where(keep_valid[:, None], top_boxes[safe], 0.0)
        col0 = jnp.full((post_nms_top_n, 1), batch_idx, rois4.dtype)
        return jnp.concatenate([col0, rois4], axis=1), keep_valid

    rois, valid = jax.vmap(one_image)(
        scores, deltas, im_info, jnp.arange(b, dtype=jnp.float32))
    return Proposals(rois, valid)
