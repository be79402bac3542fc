"""Embedding-based relation (SGG) head — Stage B.

TPU-native rebuild of the ``vrd`` module
(``lib/model/faster_rcnn/resnet_SGG_emb.py:64-264``) and the coherent parts
of ``faster_rcnn_SGG_emb.py`` (train ``forward_predicate`` `:164-274`, eval
``forward_relation`` `:580-697`):

* object + union ROIs are pooled in ONE RoIPool call and pushed through a
  shared fc6/fc7 tower as one batched matmul (the reference runs the tower
  twice); the subject/object gathers are index selects.
* the union visual embedding (fc8), object-pair visual embedding (fc_so),
  and the conv tower over 2x32x32 dual masks (spatial_type==2) are fused
  by concat -> fc_fusion -> fc_rel exactly as the reference.
* predicate scores = L2-normalized visual embedding @ L2-normalized
  GloVe-MLP predicate embeddings^T (cosine similarity); multi-label BCE in
  training, softmax at eval.
* the reference's GPU->numpy->GPU round-trip of the backbone feature
  (``faster_rcnn_SGG_emb.py:148-160``) becomes an on-device
  ``lax.stop_gradient`` — only the relation head trains.
* all pair counts are static: pairs are padded to ``max_pairs`` with a
  validity mask (the loss and eval outputs are masked accordingly).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from i2vsgg_tpu.models.inits import (dense_t, torch_linear_kernel,
                                     torch_linear_bias)
from i2vsgg_tpu.ops.boxes import union_boxes, dual_mask
from i2vsgg_tpu.ops.roi_pool import roi_pool
from i2vsgg_tpu.ops.roi_align import roi_align_avg


def _take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather as a one-hot matmul. For tiny minor dims (boxes (M, 4),
    embeddings (M, 300)) TPU gathers waste ~97% of the lanes and profiled
    ~10x slower than this MXU form; idx is small (pair indices)."""
    oh = (idx[:, None] == jnp.arange(x.shape[0])[None, :]).astype(x.dtype)
    return oh @ x


class DenseInt8(nn.Module):
    """``nn.Dense``-compatible layer (same "kernel"/"bias" param names and
    inits, so Stage-B checkpoints restore unchanged) whose matmul runs in
    int8 on the MXU: per-output-channel symmetric weight quantization +
    per-row dynamic activation quantization, fp32 rescale after the int32
    accumulate. v5e executes int8xint8 matmuls at 2x the bf16 rate, and the
    4096-wide fc6/fc7 towers are the SGG head's compute-bound hot spot
    (~90% MXU, PERF.md "Path to 500" #3) — precision is the only lever
    left there. Serving-only (no custom VJP); quality-gate with
    tools/quant_ab.py before shipping as default."""
    features: int
    fan_in: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", torch_linear_kernel(),
                       (x.shape[-1], self.features))
        b = self.param("bias", torch_linear_bias(self.fan_in),
                       (self.features,))
        if k.dtype == jnp.int8:
            # pre-quantized serving tree (utils.params.quantize_dense_
            # params): the per-step weight-quant chain below re-reads the
            # full fc6 kernel (50176x4096) through an f32 upcast + abs-max
            # + round EVERY step — measured ~3 ms of the 3.8 ms SGG fc
            # stage at the levered serving config (tools/sgg_dissect.py).
            # Weights never change between steps; the hoisted int8 tensor
            # + kernel_scale are BIT-IDENTICAL taps (pinned in
            # tests/test_sgg.py), so the quant_ab quality gate carries
            # over.
            w_s = self.param("kernel_scale", nn.initializers.ones,
                             (self.features,))
            w_q = k
        else:
            kf = k.astype(jnp.float32)
            w_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=0), 1e-8) / 127.0
            w_q = jnp.round(kf / w_s).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        a_s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
        x_q = jnp.round(xf / a_s[:, None]).astype(jnp.int8)
        y = jax.lax.dot(x_q, w_q, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (a_s[:, None] * w_s[None, :])
                + b.astype(jnp.float32))


class PredicateEmbedder(nn.Module):
    """GloVe 300-d -> emb_dim semantic predicate embeddings.
    [resnet_SGG_emb.py:188-192 prd_sem_embeddings]"""
    emb_dim: int = 300

    @nn.compact
    def __call__(self, prd_vecs):
        # torch nn.Linear default inits (reference uses bare Sequential of
        # Linear layers here)
        x = dense_t(1024, prd_vecs.shape[-1], "fc0")(prd_vecs)
        x = nn.leaky_relu(x, negative_slope=0.1)
        return dense_t(self.emb_dim, 1024, "fc1")(x)


class VRDHead(nn.Module):
    """Relation classification head over pooled features.

    Args mirror the reference's ``args`` namespace
    (parser_func.py vrd knobs): emb_dim, spatial_type, use_obj_visual.
    """
    emb_dim: int = 300
    spatial_type: int = 2
    use_obj_visual: bool = True
    pooling_size: int = 7
    dropout_rate: float = 0.5
    fc_dim: int = 4096          # fc6/fc7 width [resnet_SGG_emb.py:98-101]
    # "pool" = reference parity (resnet_SGG_emb.py:82 ROIPool); "align" =
    # RoIAlignAvg via the MXU matmul formulation — the serving default
    # (~10x cheaper on TPU; quality equivalent after training with it)
    pooling: str = "pool"
    # int8 fc6/fc7 matmuls for serving (DenseInt8; checkpoint-compatible)
    int8_fc: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, obj_boxes, union_boxes_, spatial_fea,
                 ix1, ix2, prd_vecs, *, u_map=None,
                 det_masks=None, deterministic: bool = True,
                 stage: str = "full"):
        """
        Args:
          fmap: (B, H, W, C) backbone feature map (gradient-stopped by caller).
          obj_boxes: (M, 5) [batch_idx, x1, y1, x2, y2] object rois.
          union_boxes_: (U, 5) union rois — one per ordered pair (U == P)
            unless ``u_map`` is given.
          spatial_fea: (P, 32, 32, 2) dual masks (spatial_type==2) or (P, 8).
          ix1, ix2: (P,) subject/object indices into obj_boxes.
          prd_vecs: (n_rel, 300) GloVe predicate vectors.
          u_map: optional (P,) map pair -> row of union_boxes_. The union
            box (and therefore its pooled/fc6/fc7/fc8 embedding) is
            SYMMETRIC in (i, j), so serving pools only the unordered-pair
            unions (U = P/2) and fans the embeddings back out — exactly
            halving the dominant align+fc6 work. Identical math.

        Returns: dict with 'scores' (P, n_rel) cosine logits and
          'union_emb' (P, emb_dim).
        """
        p = self.pooling_size
        m = obj_boxes.shape[0]

        # one pooled batch for objects + unions -> shared fc6/fc7 tower
        all_rois = jnp.concatenate([obj_boxes, union_boxes_], axis=0)
        if self.pooling == "align":
            pooled = roi_align_avg(fmap, all_rois, p, p, 1.0 / 16.0)
        else:
            # single-image fmap (B=1): any roi list is trivially grouped
            pooled = roi_pool(fmap, all_rois, p, p, 1.0 / 16.0, grouped=True)
        # all FC/Conv layers use torch nn.Linear/nn.Conv2d default inits:
        # the reference's FC/Conv2d wrappers (lib/model/faster_rcnn/utils.py)
        # never override them
        x = pooled.reshape(pooled.shape[0], -1).astype(self.dtype)
        if stage == "align":              # profiling bisect (sgg_dissect)
            return {"pooled": pooled}
        fc = ((lambda f, fi, name: DenseInt8(f, fi, name=name))
              if self.int8_fc else dense_t)
        x = nn.relu(fc(self.fc_dim, x.shape[-1], "fc6")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.relu(fc(self.fc_dim, self.fc_dim, "fc7")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        obj_feat = dense_t(self.emb_dim, self.fc_dim,
                           "so_vis_embeddings")(x[:m])
        x_u = nn.relu(dense_t(256, self.fc_dim, "fc8")(x[m:]))
        if u_map is not None:
            x_u = _take_rows(x_u, u_map)              # fan out to (P, 256)
        if stage == "fc":                 # profiling bisect (sgg_dissect)
            return {"x_u": x_u, "obj_emb": obj_feat}

        feats = [x_u]
        if self.use_obj_visual:
            x_s = _take_rows(obj_feat, ix1)
            x_o = _take_rows(obj_feat, ix2)
            so = nn.relu(dense_t(256, 2 * self.emb_dim, "fc_so")(
                jnp.concatenate([x_s, x_o], axis=1)))
            feats.append(so)

        conv_t = lambda f, k, fan_in, name, **kw: nn.Conv(
            f, k, kernel_init=torch_linear_kernel(),
            bias_init=torch_linear_bias(fan_in), name=name, **kw)
        if self.spatial_type == 1:
            lo = nn.relu(dense_t(256, spatial_fea.shape[-1],
                                 "fc_lov")(spatial_fea))
            feats.append(lo)
        elif self.spatial_type == 2:
            # conv tower over (P, 32, 32, 2) dual masks
            # [resnet_SGG_emb.py:105-109]. torch's same_padding is SYMMETRIC
            # (2, 2) — flax "SAME" with stride 2 would pad (1, 2) and shift
            # the windows, so pad explicitly
            pad2 = [(2, 2), (2, 2)]
            lo0 = conv_t(96, (5, 5), 5 * 5 * 2, "conv_lo0",
                         strides=(2, 2), padding=pad2)
            if det_masks is not None:
                # conv_lo0's pre-activation is LINEAR in its two mask
                # channels: z1(i,j) = relu(S[i] + O[j] - Z) where S/O are
                # the conv of (mask, 0)/(0, mask) per DETECTION and Z the
                # bias field (conv of all-zeros). M detections cost
                # 2M+1 convs instead of P >> 2M pair convs — exact.
                dm = det_masks.astype(self.dtype)[..., None]   # (M,32,32,1)
                zch = jnp.zeros_like(dm)
                stacked = jnp.concatenate([
                    jnp.concatenate([dm, zch], -1),
                    jnp.concatenate([zch, dm], -1),
                    jnp.zeros_like(dm[:1].repeat(2, -1)),
                ], axis=0)                                # (2M+1, 32, 32, 2)
                ab = lo0(stacked)
                mm = dm.shape[0]
                z = nn.relu(jnp.take(ab, ix1, axis=0)
                            + jnp.take(ab, mm + ix2, axis=0) - ab[2 * mm])
            else:
                z = nn.relu(lo0(spatial_fea.astype(self.dtype)))
            z = nn.relu(conv_t(128, (5, 5), 5 * 5 * 96, "conv_lo1",
                               strides=(2, 2), padding=pad2)(z))
            z = nn.relu(conv_t(64, (8, 8), 8 * 8 * 128, "conv_lo2",
                               padding="VALID")(z))
            z = z.reshape(z.shape[0], -1)
            lo = nn.relu(dense_t(256, z.shape[-1], "fc_lov")(z))
            feats.append(lo)

        x = jnp.concatenate(feats, axis=1)
        x = nn.relu(dense_t(256, x.shape[-1], "fc_fusion")(x))
        vis_emb = dense_t(self.emb_dim, 256, "fc_rel")(x)

        prd_emb = PredicateEmbedder(self.emb_dim,
                                    name="prd_sem_embeddings")(prd_vecs)
        prd_emb = prd_emb / jnp.maximum(
            jnp.linalg.norm(prd_emb, axis=1, keepdims=True), 1e-12)
        vis_n = vis_emb / jnp.maximum(
            jnp.linalg.norm(vis_emb, axis=1, keepdims=True), 1e-12)
        scores = vis_n @ prd_emb.T                      # (P, n_rel) in [-1, 1]
        return {"scores": scores, "union_emb": vis_emb,
                "prd_emb": prd_emb, "obj_emb": obj_feat}


def bce_multilabel_loss(scores, labels, pair_valid):
    """BCEWithLogits averaged like the reference's ``nn.BCEWithLogitsLoss``
    (mean over all elements) but masked to valid pairs.
    [resnet_SGG_emb.py:95 criterion; faster_rcnn_SGG_emb.py:269]"""
    logp = jax.nn.log_sigmoid(scores)
    lognp = jax.nn.log_sigmoid(-scores)
    per_elem = -(labels * logp + (1.0 - labels) * lognp)
    w = pair_valid.astype(scores.dtype)[:, None]
    return jnp.sum(per_elem * w) / jnp.maximum(jnp.sum(w) * scores.shape[1], 1.0)


class SGGModel(nn.Module):
    """Frozen-detector + VRD head relation model (Stage B).

    Wraps a backbone trunk (params restored from the Stage-A checkpoint and
    frozen via stop_gradient) and the VRD head. The driver supplies padded
    pair tensors; union boxes and dual masks are computed on device.
    """
    trunk: nn.Module
    vrd: VRDHead
    n_rel: int

    def __call__(self, images, im_info, obj_boxes, classes, ix1, ix2,
                 pair_valid, prd_vecs, *, pair_static=None,
                 deterministic: bool = True):
        """
        Args:
          images: (1, H, W, 3) preprocessed frame.
          im_info: (3,) [h, w, scale].
          obj_boxes: (M, 4) object boxes in input-image scale.
          classes: (M,) int class ids (unused by the head but returned).
          ix1/ix2: (P,) pair indices; pair_valid: (P,) bool.
          pair_static: see ``head_on_features``.
        Returns dict with 'scores' (P, n_rel) and spatial features.
        """
        base_feat, _ = self.trunk(images)
        return self.head_on_features(base_feat, im_info, obj_boxes, ix1, ix2,
                                     pair_valid, prd_vecs,
                                     pair_static=pair_static,
                                     deterministic=deterministic)

    def head_on_features(self, base_feat, im_info, obj_boxes, ix1, ix2,
                         pair_valid, prd_vecs, *, pair_static=None,
                         deterministic: bool = True, stage: str = "full"):
        """Relation head on a precomputed backbone feature map.

        Used by the fused serving pipeline (``serve.py``) to share ONE trunk
        pass between detection and relation scoring — the reference runs the
        (identical, frozen) backbone twice per frame
        (faster_rcnn_SGG_emb.py:60 after the detector already ran).

        ``pair_static``: optional ``(iu1, iu2, u_map)`` numpy triple from
        ``serve.make_union_dedup`` when the pair layout is static (serving,
        all-pairs eval): union rois are pooled once per UNORDERED pair and
        fanned back out via ``u_map`` — union boxes are symmetric, so this
        is mathematically identical at half the align+fc6 work.
        """
        base_feat = jax.lax.stop_gradient(base_feat).astype(jnp.float32)

        m = obj_boxes.shape[0]
        col0 = jnp.zeros((m, 1), obj_boxes.dtype)
        obj_rois = jnp.concatenate([col0, obj_boxes], axis=1)

        sub = _take_rows(obj_boxes, ix1)
        obj = _take_rows(obj_boxes, ix2)
        u_map = None
        if pair_static is not None:
            iu1, iu2, u_map = (jnp.asarray(a) for a in pair_static)
            sub_u = _take_rows(obj_boxes, iu1)
            obj_u = _take_rows(obj_boxes, iu2)
            u = union_boxes(sub_u, obj_u, im_info[0], im_info[1],
                            margin=10.0)
        else:
            u = union_boxes(sub, obj, im_info[0], im_info[1], margin=10.0)
        union_rois = jnp.concatenate(
            [jnp.zeros((u.shape[0], 1), u.dtype), u], axis=1)

        # dual masks rasterized w.r.t. the union box frame: the reference
        # builds masks of subject/object INSIDE the 32x32 union window
        # (faster_rcnn_SGG_emb.py:255-260 uses image-frame masks of the
        # subject and object boxes); here: image-frame, matching _getDualMask.
        # Rasterized per DETECTION (M masks, not 2P) — the head's conv_lo0
        # is linear per channel, so the per-pair stack is reconstructed
        # after the conv (det_masks path in VRDHead; exact).
        det_masks = dual_mask(im_info[0], im_info[1],
                              obj_boxes)                    # (M, 32, 32)

        out = self.vrd(base_feat, obj_rois, union_rois, None,
                       ix1, ix2, prd_vecs, u_map=u_map, det_masks=det_masks,
                       deterministic=deterministic, stage=stage)
        out["pair_valid"] = pair_valid
        return out
