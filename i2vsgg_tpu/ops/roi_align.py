"""RoIAlign with the reference's *single-sample* semantics.

The reference's CUDA kernel (``lib/model/roi_align/src/roi_align_kernel.cu:15-73``)
differs from torchvision RoIAlign: per output cell it takes ONE bilinear tap at

    bin_h = (roi_h_end - roi_h_start + 1) / (aligned_height - 1)
    h     = ph * bin_h + roi_h_start          (similarly for w)

with ``hstart = min(floor(h), H-2)`` and zero output for taps outside the
image. ``RoIAlignAvg`` (``modules/roi_align.py:18-29``) evaluates a
(P+1)x(P+1) grid and 2x2-stride-1 average-pools it down to PxP.

TPU-native design: the whole op is a batched gather + 4-tap lerp expressed in
jnp — XLA lowers it to a fused dynamic-gather; no scalar loops. Layout is NHWC
(channels-last minor dim = TPU lane dim). The backward pass is the natural VJP
of the gather (scatter-add), matching the CUDA backward's atomicAdd. A Pallas
kernel with per-roi DMA lives in ``ops/pallas/roi_align_kernel.py`` for the
hot inference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              aligned_height: int, aligned_width: int,
              spatial_scale: float) -> jnp.ndarray:
    """Single-sample RoIAlign.

    Args:
      features: (B, H, W, C) feature map (NHWC).
      rois: (R, 5) [batch_idx, x1, y1, x2, y2] in input-image coords.
      aligned_height/width: output grid size.
      spatial_scale: feature stride reciprocal (e.g. 1/16).

    Returns: (R, aligned_height, aligned_width, C).
    """
    b, h, w, c = features.shape
    r = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)                    # (R,)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1 + 1.0, 0.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 0.0)
    bin_w = roi_w / (aligned_width - 1.0)
    bin_h = roi_h / (aligned_height - 1.0)

    ph = jnp.arange(aligned_height, dtype=features.dtype)
    pw = jnp.arange(aligned_width, dtype=features.dtype)
    ys = ph[None, :] * bin_h[:, None] + y1[:, None]             # (R, AH)
    xs = pw[None, :] * bin_w[:, None] + x1[:, None]             # (R, AW)

    inside_y = (ys >= 0) & (ys < h)                             # (R, AH)
    inside_x = (xs >= 0) & (xs < w)                             # (R, AW)

    hstart = jnp.minimum(jnp.floor(ys), h - 2.0)                # (R, AH)
    wstart = jnp.minimum(jnp.floor(xs), w - 2.0)                # (R, AW)
    h_ratio = ys - hstart                                       # (R, AH)
    w_ratio = xs - wstart                                       # (R, AW)
    hs = jnp.clip(hstart.astype(jnp.int32), 0, h - 2)
    ws = jnp.clip(wstart.astype(jnp.int32), 0, w - 2)

    # Gather the 4 corners: index arrays broadcast to (R, AH, AW).
    bi = batch_idx[:, None, None]
    yi = hs[:, :, None]
    xi = ws[:, None, :]
    f = features
    ul = f[bi, yi, xi]                                          # (R, AH, AW, C)
    ur = f[bi, yi, xi + 1]
    dl = f[bi, yi + 1, xi]
    dr = f[bi, yi + 1, xi + 1]

    hr = h_ratio[:, :, None, None]
    wr = w_ratio[:, None, :, None]
    out = (ul * (1 - hr) * (1 - wr) + ur * (1 - hr) * wr
           + dl * hr * (1 - wr) + dr * hr * wr)

    inside = (inside_y[:, :, None] & inside_x[:, None, :])[..., None]
    return jnp.where(inside, out, 0.0).astype(features.dtype)


@functools.partial(jax.jit, static_argnames=("pooled_height", "pooled_width"))
def roi_align_avg(features: jnp.ndarray, rois: jnp.ndarray,
                  pooled_height: int = 7, pooled_width: int = 7,
                  spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """RoIAlignAvg: (P+1)x(P+1) single-sample grid then 2x2 stride-1 avg-pool.
    [modules/roi_align.py:18-29]

    Returns (R, P, P, C).
    """
    x = roi_align(features, rois, pooled_height + 1, pooled_width + 1,
                  spatial_scale)
    return 0.25 * (x[:, :-1, :-1] + x[:, 1:, :-1] + x[:, :-1, 1:] + x[:, 1:, 1:])
