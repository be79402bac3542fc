"""RoIPool (max pooling over quantized bins).

Implements the semantics of the reference's ``roi_layers.ROIPool``
(``lib/model/roi_layers/roi_pool.py`` — the detectron2-style ``model._C``
binding whose C++ sources are absent from the repo; the canonical torchvision
ROIPool math) as used by the SGG relation head
(``lib/model/faster_rcnn/resnet_SGG_emb.py:82``):

    roi_start = round(coord * spatial_scale)
    roi_size  = max(roi_end - roi_start + 1, 1)
    bin(p)    = [floor(p * roi_size / P) + roi_start,
                 ceil((p+1) * roi_size / P) + roi_start)   clamped to [0, dim]
    out       = max over bin, 0 if bin empty

TPU-native design: bins are rectangular, so the max is computed separably —
a masked row-max (P, H) sweep then a masked col-max (P, W) sweep — all dense
VPU work with static shapes; no argmax bookkeeping is needed (the backward is
the natural VJP of max). Rois are vmapped; XLA fuses the broadcasted
mask-select into the reductions so nothing (R, P, H, W, C)-shaped ever
materializes (a ``lax.map`` variant was 20x slower: one sequential scan step
per roi).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = jnp.finfo(jnp.float32).min


@functools.partial(jax.jit, static_argnames=("pooled_height", "pooled_width",
                                             "grouped"))
def roi_pool(features: jnp.ndarray, rois: jnp.ndarray,
             pooled_height: int = 7, pooled_width: int = 7,
             spatial_scale: float = 1.0 / 16.0, *,
             grouped: bool = False) -> jnp.ndarray:
    """Max RoIPool.

    Args:
      features: (B, H, W, C) NHWC feature map.
      rois: (R, 5) [batch_idx, x1, y1, x2, y2] in input-image coords.
      grouped: caller GUARANTEES per-image grouped rois (R = B*N with
        batch_idx = r // N). Enables the Pallas kernel, which ignores the
        rois[:, 0] column and derives the batch index from position; passing
        ungrouped rois with grouped=True silently pools the wrong image.

    Returns: (R, P, P, C).

    On TPU with grouped=True this dispatches to the Pallas kernel — 5x
    faster, bit-identical (ops/pallas/roi_pool_kernel.py); the jnp sweep
    below honors rois[:, 0] and is the fallback and parity oracle.
    """
    b, h, w, c = features.shape
    from i2vsgg_tpu.ops.roi_align import _on_tpu
    if (grouped and _on_tpu() and rois.shape[0] % b == 0
            and h * w * c * 4 <= 8 * 2 ** 20):
        from i2vsgg_tpu.ops.pallas.roi_pool_kernel import roi_pool_pallas
        return roi_pool_pallas(features, rois, pooled_height, pooled_width,
                               spatial_scale)
    ph, pw = pooled_height, pooled_width

    def one_roi(roi):
        bi = roi[0].astype(jnp.int32)
        # After round(), roi extents are exact small integers, so bin edges
        # floor(p*roi/P) / ceil((p+1)*roi/P) are computed in exact int32
        # arithmetic instead of error-prone fp32 division.
        start_w = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
        start_h = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
        end_w = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
        end_h = jnp.round(roi[4] * spatial_scale).astype(jnp.int32)
        roi_w = jnp.maximum(end_w - start_w + 1, 1)
        roi_h = jnp.maximum(end_h - start_h + 1, 1)

        p_h = jnp.arange(ph, dtype=jnp.int32)
        p_w = jnp.arange(pw, dtype=jnp.int32)
        hstart = jnp.clip(p_h * roi_h // ph + start_h, 0, h)
        hend = jnp.clip(-((-(p_h + 1) * roi_h) // ph) + start_h, 0, h)
        wstart = jnp.clip(p_w * roi_w // pw + start_w, 0, w)
        wend = jnp.clip(-((-(p_w + 1) * roi_w) // pw) + start_w, 0, w)

        hh = jnp.arange(h, dtype=jnp.int32)
        ww = jnp.arange(w, dtype=jnp.int32)
        row_mask = (hh[None, :] >= hstart[:, None]) & (hh[None, :] < hend[:, None])
        col_mask = (ww[None, :] >= wstart[:, None]) & (ww[None, :] < wend[:, None])

        # single-image batches (the SGG per-frame path) skip the dynamic
        # batch gather entirely
        fmap = features[0] if b == 1 else features[bi]           # (H, W, C)
        # row sweep: (PH, W, C)
        rows = jnp.max(
            jnp.where(row_mask[:, :, None, None], fmap[None], NEG), axis=1)
        # col sweep: (PH, PW, C)
        out = jnp.max(
            jnp.where(col_mask[None, :, :, None], rows[:, None], NEG), axis=2)

        empty = ((hend <= hstart)[:, None] | (wend <= wstart)[None, :])
        return jnp.where(empty[..., None], 0.0, out)

    return jax.vmap(one_roi)(rois).astype(features.dtype)
