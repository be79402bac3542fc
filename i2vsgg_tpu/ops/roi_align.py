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


def _on_tpu() -> bool:
    """True when ops trace/execute for TPU (honors default_device(cpu)
    overrides like host-side param init)."""
    if jax.default_backend() != "tpu":
        return False
    dev = jax.config.jax_default_device
    return dev is None or getattr(dev, "platform", "tpu") == "tpu"


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
def roi_align_avg_gather(features: jnp.ndarray, rois: jnp.ndarray,
                         pooled_height: int = 7, pooled_width: int = 7,
                         spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """RoIAlignAvg via 4-corner gathers (semantics oracle; see
    ``roi_align_avg`` for the MXU formulation used on the hot path).

    Returns (R, P, P, C).
    """
    x = roi_align(features, rois, pooled_height + 1, pooled_width + 1,
                  spatial_scale)
    return 0.25 * (x[:, :-1, :-1] + x[:, 1:, :-1] + x[:, :-1, 1:] + x[:, 1:, 1:])


def _interp_matrix(coords, extent: int, size: int, dtype):
    """Per-roi 1-D bilinear interpolation matrix.

    coords: (R, G) sample positions. Returns (R, G, extent) weights W with
    out[g] = sum_h W[g, h] * f[h] reproducing the reference's single-tap
    bilinear (hstart = min(floor(y), H-2), extrapolating ratios, zero
    outside [0, extent)). [roi_align_kernel.cu:42-73]
    """
    inside = (coords >= 0) & (coords < extent)
    start = jnp.minimum(jnp.floor(coords), extent - 2.0)
    ratio = coords - start
    s = jnp.clip(start.astype(jnp.int32), 0, extent - 2)
    grid = jnp.arange(extent, dtype=jnp.int32)
    one0 = (grid == s[..., None]).astype(dtype)
    one1 = (grid == (s + 1)[..., None]).astype(dtype)
    w = one0 * (1.0 - ratio[..., None]).astype(dtype) \
        + one1 * ratio[..., None].astype(dtype)
    return w * inside[..., None].astype(dtype)


@functools.partial(jax.jit, static_argnames=("pooled_height", "pooled_width",
                                             "grid"))
def roi_align_avg(features: jnp.ndarray, rois: jnp.ndarray,
                  pooled_height: int = 7, pooled_width: int = 7,
                  spatial_scale: float = 1.0 / 16.0,
                  grid: tuple | None = None) -> jnp.ndarray:
    """RoIAlignAvg as two MXU contractions (exact single-tap semantics).

    The (P+1)x(P+1) single-tap grid + 2x2 stride-1 avg-pool is a separable
    linear map of the feature map, so it factors into per-roi row/col weight
    matrices with the averaging folded in:

        out[r] = (A @ Ry[r]) @ fmap[b_r] @ (A @ Rx[r])^T        (per channel)

    Two batched matmuls replace the four corner gathers — on TPU this is
    ~5x faster (gathers are the profiled hot spot; matmuls ride the MXU).
    Rois must be grouped by image: R = B * N with batch_idx = r // N.

    ``grid`` optionally restricts the output to a subset of the PxP grid
    positions (same subset on both axes) — e.g. (0, 2, 4, 6) computes
    exactly the cells a following stride-2 conv would sample, for a third
    of the contraction work. Returns (R, len(grid), len(grid), C) then.

    Returns (R, P, P, C).
    """
    b, h, w, c = features.shape
    r = rois.shape[0]
    assert r % b == 0, "rois must be grouped per image (R = B * N)"
    n = r // b
    ph, pw = pooled_height, pooled_width
    dtype = features.dtype

    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    bin_w = jnp.maximum(x2 - x1 + 1.0, 0.0) / pw
    bin_h = jnp.maximum(y2 - y1 + 1.0, 0.0) / ph

    gy = jnp.arange(ph + 1, dtype=jnp.float32)
    gx = jnp.arange(pw + 1, dtype=jnp.float32)
    ys = gy[None, :] * bin_h[:, None] + y1[:, None]          # (R, P+1)
    xs = gx[None, :] * bin_w[:, None] + x1[:, None]

    ry = _interp_matrix(ys, h, ph + 1, dtype)                # (R, P+1, H)
    rx = _interp_matrix(xs, w, pw + 1, dtype)                # (R, P+1, W)
    # fold the 2x2 stride-1 average into the interp matrices
    avg_y = (0.5 * (jnp.eye(ph + 1, dtype=dtype)[:-1]
                    + jnp.eye(ph + 1, dtype=dtype)[1:]))     # (P, P+1)
    avg_x = (0.5 * (jnp.eye(pw + 1, dtype=dtype)[:-1]
                    + jnp.eye(pw + 1, dtype=dtype)[1:]))
    ry = jnp.einsum("ip,rph->rih", avg_y, ry)                # (R, P, H)
    rx = jnp.einsum("jq,rqw->rjw", avg_x, rx)                # (R, P, W)
    if grid is not None:
        sel = jnp.asarray(grid, jnp.int32)
        ry = ry[:, sel]
        rx = rx[:, sel]
        ph = pw = len(grid)

    # NOTE: a Pallas variant exists (ops/pallas/roi_align_kernel.py — the
    # round-2 rewrite pre-stacks PS=8 row weights and tiles channels, which
    # lifts the earlier Mosaic shape-cast limitation) but it is NOT
    # dispatched: it measured ~2x SLOWER than this einsum pair at every
    # (r_tile, c_tile) tried. The first contraction's K=H(~38) is too
    # skinny for the MXU in the kernel's factorization (~15% util ceiling),
    # while XLA fuses the einsum pair with no HBM intermediate at the same
    # compute limit (PERF.md round-2 negative results). Einsums stay the
    # production path.

    ry_g = ry.reshape(b, n, ph, h)
    rx_g = rx.reshape(b, n, pw, w)

    def per_image(fmap, ry_i, rx_i):
        # contract the LONGER spatial dim first so the materialized
        # (N, P, other_dim, C) intermediate is minimal. Measured variants
        # (8x600x960 fused bench): this einsum pair 169 fps; combined
        # one-matmul weights 252->163 fps; unbatched reshape-matmul 139 fps
        # (fmap transpose relayouts dominate).
        if w >= h:
            t = jnp.einsum("njw,hwc->njhc", rx_i, fmap,
                           preferred_element_type=jnp.float32)
            return jnp.einsum("njhc,nih->nijc", t, ry_i,
                              preferred_element_type=jnp.float32)
        t = jnp.einsum("nih,hwc->niwc", ry_i, fmap,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("niwc,njw->nijc", t, rx_i,
                          preferred_element_type=jnp.float32)

    out = jax.vmap(per_image)(features, ry_g, rx_g)          # (B,N,P,P,C)
    return out.reshape(r, ph, pw, c).astype(dtype)
