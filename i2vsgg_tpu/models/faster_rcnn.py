"""Domain-adaptive Faster R-CNN: the Stage-A detection model.

TPU-native rebuild of
``lib/model/faster_rcnn/faster_rcnn_instance_styleD_bilinear.py:24-215`` +
``resnet_instance_styleD_bilinear.py:336-443``:

* one flax module holding trunk / RPN head / RCNN head / discriminators;
  the proposal, anchor-target and proposal-target stages are pure functions
  (no params) running fully on-device between module calls — no CPU NMS
  bounce, no per-image Python loops.
* three modes compiled as three jit specializations:
  - ``train_source``: full detection losses + discriminator outputs
    (GRL flips discriminator grads into the trunk).
  - ``target``: trunk -> RPN proposals (capped at the reference's 128
    target-batch cap) -> discriminator outputs only (early return,
    faster_rcnn_instance_styleD_bilinear.py:129-130).
  - ``inference``: proposals -> heads -> (rois, cls_prob, bbox_pred).
* all shapes static: proposals padded to post_nms_top_n with validity masks,
  sampled rois fixed at TRAIN.BATCH_SIZE.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.models import backbones as bb
from i2vsgg_tpu.models.discriminators import NetDPixel, NetDStyle
from i2vsgg_tpu.models.rpn import (RPNHead, rpn_softmax_fg,
                                   generate_proposals, Proposals)
from i2vsgg_tpu.models.targets import anchor_targets, proposal_targets
from i2vsgg_tpu.ops.anchors import generate_anchors, shifted_anchors
from i2vsgg_tpu.ops.boxes import smooth_l1_loss
from i2vsgg_tpu.ops.roi_align import roi_align_avg
from i2vsgg_tpu.ops.roi_pool import roi_pool


def _masked_softmax_ce(logits, labels, mask):
    """Cross entropy averaged over mask (labels clipped for safety)."""
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


class FasterRCNN_DA(nn.Module):
    """Detector + adversarial-DA heads."""
    num_classes: int
    cfg: Config
    backbone: str = "res101"            # res50 | res101 | vgg16
    class_agnostic: bool = False
    ic: bool = False                    # instance-context feature concat
    gc: bool = False                    # global (style) context concat

    def setup(self):
        dtype = jnp.dtype(self.cfg.COMPUTE_DTYPE)
        if self.backbone.startswith("res"):
            depth = int(self.backbone[3:])
            self.trunk = bb.ResNetTrunk(depth=depth, dtype=dtype)
            self.head = bb.ResNetHead(depth=depth, dtype=dtype)
            feat_d = 2048
        elif self.backbone == "vgg16":
            self.trunk = bb.VGG16Trunk(dtype=dtype)
            self.head = bb.VGG16Head(dtype=dtype)
            feat_d = 4096
        else:
            raise ValueError(self.backbone)
        self.rpn = RPNHead(num_anchors=self.cfg.num_anchors, dtype=dtype)
        self.netD_pixel = NetDPixel(context=self.ic, dtype=dtype)
        self.netD_style = NetDStyle(context=self.gc, dtype=dtype)
        if self.gc:
            feat_d += 512
        if self.ic:
            feat_d += 128
        # head weight init: normal(0, 0.01) / normal(0, 0.001)
        # [faster_rcnn_instance_styleD_bilinear.py:195-211]
        self.cls_score = nn.Dense(
            self.num_classes, name="cls_score",
            kernel_init=nn.initializers.normal(0.01))
        nb = 4 if self.class_agnostic else 4 * self.num_classes
        self.bbox_pred = nn.Dense(
            nb, name="bbox_pred", kernel_init=nn.initializers.normal(0.001))
        self._base_anchors = generate_anchors(
            ratios=self.cfg.ANCHOR_RATIOS, scales=self.cfg.ANCHOR_SCALES)

    # ---------- shared stages -------------------------------------------

    def _proposals(self, base_feat, rpn_cls, rpn_bbox, im_info, *,
                   training: bool, target: bool) -> Proposals:
        h, w = base_feat.shape[1:3]
        anchors = shifted_anchors(h, w, self.cfg.FEAT_STRIDE[0],
                                  self._base_anchors)
        fg = rpn_softmax_fg(rpn_cls, self.cfg.num_anchors)
        # the reference detaches BOTH rpn outputs before proposal generation
        # [rpn.py:77: (rpn_cls_prob.data, rpn_bbox_pred.data)] — without
        # this, gradients flow from the RCNN box-regression TARGETS
        # (encode_boxes(rois, gt) / BBOX_NORMALIZE_STDS — a 5-10x
        # amplification) back through the proposal coordinates into
        # rpn/bbox_pred: measured cos 0.10 / 10x-norm gradient divergence vs
        # the reference on that param (tools/grad_parity.py, round 4) — the
        # round-3 Stage-A trained-mAP gap's root cause.
        fg = jax.lax.stop_gradient(fg)
        rpn_bbox = jax.lax.stop_gradient(rpn_bbox)
        c = self.cfg.TRAIN if training else self.cfg.TEST
        post = c.RPN_POST_NMS_TOP_N
        if target and training:
            post = self.cfg.TRAIN.RPN_POST_NMS_TOP_N_TARGET
        return generate_proposals(
            fg, rpn_bbox, im_info, anchors,
            pre_nms_top_n=c.RPN_PRE_NMS_TOP_N, post_nms_top_n=post,
            nms_thresh=c.RPN_NMS_THRESH)

    def _pool(self, base_feat, rois_flat):
        # ROI coordinates are NOT differentiated through (reference parity:
        # torch RoIAlign takes rois as constants; letting grads flow through
        # the bilinear sample positions also produces NaNs on degenerate
        # padded rois in the target pass)
        rois_flat = jax.lax.stop_gradient(rois_flat)
        p = self.cfg.POOLING_SIZE
        scale = 1.0 / self.cfg.FEAT_STRIDE[0]
        if self.cfg.POOLING_MODE == "align":
            return roi_align_avg(base_feat, rois_flat, p, p, scale)
        # rois_flat comes from generate_proposals: (B*N, 5) per-image grouped
        return roi_pool(base_feat, rois_flat, p, p, scale, grouped=True)

    def _classify(self, pooled, feat_image, feat_instance, deterministic=True):
        """ROI features -> (cls_score, bbox_pred) with optional context
        concat. [faster_rcnn_instance_styleD_bilinear.py:131-163]"""
        if self.backbone == "vgg16":
            x = self.head(pooled, deterministic=deterministic)
        else:
            x = self.head(pooled)
        x = x.astype(jnp.float32)
        if self.gc:
            n_rep = x.shape[0] // feat_image.shape[0]
            fi = jnp.repeat(feat_image, n_rep, axis=0)
            x = jnp.concatenate([fi, x], axis=1)
        if self.ic:
            x = jnp.concatenate([feat_instance.reshape(x.shape[0], -1), x], 1)
        return self.cls_score(x), self.bbox_pred(x)

    # ---------- modes ----------------------------------------------------

    def __call__(self, images, im_info, gt_boxes=None, *, mode: str = "inference",
                 eta: float = 1.0, eta_style: float = 1.0) -> Dict[str, Any]:
        if mode == "train_source":
            return self.train_source(images, im_info, gt_boxes, eta, eta_style)
        if mode == "target":
            return self.target_pass(images, im_info, eta, eta_style)
        return self.inference(images, im_info)

    def target_pass(self, images, im_info, eta=1.0, eta_style=1.0):
        """Target-domain adversarial pass: discriminator outputs only.
        [faster_rcnn_instance_styleD_bilinear.py:60-130]"""
        base_feat, tap = self.trunk(images)
        d_style = self.netD_style(tap, eta_style)
        if self.gc:
            d_style = d_style[0]
        rpn_cls, rpn_bbox = self.rpn(base_feat)
        props = self._proposals(base_feat, rpn_cls, rpn_bbox, im_info,
                                training=True, target=True)
        rois_flat = props.rois.reshape(-1, 5)
        pooled = self._pool(base_feat, rois_flat)
        d_instance = self.netD_pixel(pooled, eta)
        if self.ic:
            d_instance = d_instance[0]
        return {"d_instance": d_instance, "d_style": d_style,
                "roi_valid": props.valid.reshape(-1)}

    def train_source(self, images, im_info, gt_boxes, eta=1.0, eta_style=1.0):
        """Source pass with detection losses + discriminator outputs."""
        cfg = self.cfg
        b = images.shape[0]
        base_feat, tap = self.trunk(images)

        # style discriminator (+ detached context feature when gc)
        if self.gc:
            d_style, _ = self.netD_style(tap, eta_style)
            _, feat_image = self.netD_style(jax.lax.stop_gradient(tap),
                                            eta_style)
        else:
            d_style = self.netD_style(tap, eta_style)
            feat_image = None

        rpn_cls, rpn_bbox = self.rpn(base_feat)
        props = self._proposals(base_feat, rpn_cls, rpn_bbox, im_info,
                                training=True, target=False)

        # ---- RPN losses [rpn.py:75-108] ----
        h, w = base_feat.shape[1:3]
        anchors = shifted_anchors(h, w, cfg.FEAT_STRIDE[0], self._base_anchors)
        akeys = jax.random.split(self.make_rng("sampling"), b)
        at = jax.vmap(lambda k, g, i: anchor_targets(
            k, anchors, g, i,
            positive_overlap=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
            negative_overlap=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
            clobber_positives=cfg.TRAIN.RPN_CLOBBER_POSITIVES,
            fg_fraction=cfg.TRAIN.RPN_FG_FRACTION,
            batch_size=cfg.TRAIN.RPN_BATCHSIZE))(akeys, gt_boxes, im_info)

        a = cfg.num_anchors
        rpn_logits = jnp.stack(
            [rpn_cls[..., :a], rpn_cls[..., a:]], axis=-1).reshape(b, -1, 2)
        rpn_loss_cls = _masked_softmax_ce(rpn_logits, at.labels,
                                          at.labels >= 0)
        rpn_deltas = rpn_bbox.reshape(b, -1, 4)
        rpn_loss_box = smooth_l1_loss(
            rpn_deltas, at.bbox_targets,
            at.inside_weights[..., None], at.outside_weights[..., None],
            sigma=3.0, reduce_dims=(-1, -2))

        # ---- proposal sampling + RCNN losses ----
        pkeys = jax.random.split(self.make_rng("sampling2"), b)
        rt = jax.vmap(lambda k, r, v, g, bi: proposal_targets(
            k, r, v, g, bi,
            rois_per_image=cfg.TRAIN.BATCH_SIZE,
            fg_fraction=cfg.TRAIN.FG_FRACTION,
            fg_thresh=cfg.TRAIN.FG_THRESH,
            bg_thresh_hi=cfg.TRAIN.BG_THRESH_HI,
            bg_thresh_lo=cfg.TRAIN.BG_THRESH_LO,
            bbox_normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
            bbox_normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS,
            bbox_inside_weights=cfg.TRAIN.BBOX_INSIDE_WEIGHTS))(
                pkeys, props.rois, props.valid, gt_boxes,
                jnp.arange(b))

        s = cfg.TRAIN.BATCH_SIZE
        rois_flat = rt.rois.reshape(b * s, 5)
        pooled = self._pool(base_feat, rois_flat)

        if self.ic:
            d_instance, _ = self.netD_pixel(pooled, eta)
            _, feat_instance = self.netD_pixel(
                jax.lax.stop_gradient(pooled), eta)
        else:
            d_instance = self.netD_pixel(pooled, eta)
            feat_instance = None

        cls_score, bbox_pred = self._classify(pooled, feat_image,
                                              feat_instance,
                                              deterministic=False)
        labels_flat = rt.labels.reshape(-1)
        if not self.class_agnostic:
            bp = bbox_pred.reshape(b * s, -1, 4)
            bbox_pred = jnp.take_along_axis(
                bp, labels_flat[:, None, None].astype(jnp.int32).repeat(4, -1),
                axis=1)[:, 0]
        rcnn_loss_cls = _masked_softmax_ce(
            cls_score, labels_flat, jnp.ones_like(labels_flat, bool))
        rcnn_loss_bbox = smooth_l1_loss(
            bbox_pred, rt.bbox_targets.reshape(b * s, 4),
            rt.inside_weights.reshape(b * s, 4),
            rt.outside_weights.reshape(b * s, 4), sigma=1.0,
            reduce_dims=(-1,))

        fg_cnt = jnp.sum(labels_flat > 0)
        return {
            "rois": rt.rois, "rois_label": rt.labels,
            "rpn_loss_cls": rpn_loss_cls, "rpn_loss_box": rpn_loss_box,
            "rcnn_loss_cls": rcnn_loss_cls, "rcnn_loss_bbox": rcnn_loss_bbox,
            "d_instance": d_instance, "d_style": d_style,
            "fg_cnt": fg_cnt,
        }

    def inference(self, images, im_info):
        """Eval forward: (rois, cls_prob, bbox_pred, roi_valid).
        [test_net_instance_styleD_bilinear.py:133-176 model call]

        ResNet + align pooling takes a restructured (mathematically
        identical) fast path:

        * layer4's stride-2 block0 only ever reads pooled grid positions
          (0,2,4,6)^2 — so only that 4x4 subgrid is pooled and block0 runs
          stride 1 (1/3 of the pooling work, exact same values).
        * netD_pixel's conv1 is a no-bias 1x1 (linear) — it commutes with
          RoIAlign, so it is applied ONCE to the feature map and the ic
          context pools 512 channels instead of 1024 (also moves the
          per-roi conv1 FLOPs to the fmap).
        """
        base_feat, tap = self.trunk(images)
        rpn_cls, rpn_bbox = self.rpn(base_feat)
        props = self._proposals(base_feat, rpn_cls, rpn_bbox, im_info,
                                training=False, target=False)
        b, n = props.rois.shape[:2]
        rois_flat = props.rois.reshape(b * n, 5)

        p = self.cfg.POOLING_SIZE
        scale = 1.0 / self.cfg.FEAT_STRIDE[0]
        fused = (self.backbone.startswith("res")
                 and self.cfg.POOLING_MODE == "align" and p == 7)
        feat_image = feat_instance = None
        if self.gc:
            _, feat_image = self.netD_style(tap, 0.0)
        if fused:
            rf = jax.lax.stop_gradient(rois_flat)
            pooled4 = roi_align_avg(base_feat, rf, p, p, scale,
                                    grid=(0, 2, 4, 6))
            x = self.head(pooled4, first_stride=1).astype(jnp.float32)
            if self.ic:
                f512 = self.netD_pixel.preconv(base_feat)
                pooled_ic = roi_align_avg(f512, rf, p, p, scale)
                feat_instance = self.netD_pixel.context_tail(pooled_ic)
            if self.gc:
                n_rep = x.shape[0] // feat_image.shape[0]
                x = jnp.concatenate(
                    [jnp.repeat(feat_image, n_rep, axis=0), x], axis=1)
            if self.ic:
                x = jnp.concatenate(
                    [feat_instance.reshape(x.shape[0], -1), x], axis=1)
            cls_score, bbox_pred = self.cls_score(x), self.bbox_pred(x)
        else:
            pooled = self._pool(base_feat, rois_flat)
            if self.ic:
                _, feat_instance = self.netD_pixel(pooled, 0.0)
            cls_score, bbox_pred = self._classify(pooled, feat_image,
                                                  feat_instance,
                                                  deterministic=True)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        return {
            "rois": props.rois,
            "roi_valid": props.valid,
            "cls_prob": cls_prob.reshape(b, n, -1),
            "bbox_pred": bbox_pred.reshape(b, n, -1),
            # exposed so the fused serving pipeline can share one trunk pass
            # with the SGG head (serve.py) instead of recomputing it
            "base_feat": base_feat,
        }
