"""Anchor generation.

Reimplements the classic Faster R-CNN anchor enumeration
(``lib/model/rpn/generate_anchors.py:45-105``): ratio enumeration around a
base 16x16 window followed by scale enumeration. Computed once at trace/setup
time in numpy (startup-time constant, like the reference), then broadcast to
the feature grid in jnp inside the jitted program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack([x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
                      x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)])


def generate_anchors(base_size: int = 16,
                     ratios=(0.5, 1.0, 2.0),
                     scales=(8, 16, 32)) -> np.ndarray:
    """(A, 4) float64 anchors around the (0,0,15,15) reference window."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1
    w, h, xc, yc = _whctrs(base)
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = _mkanchors(ws, hs, xc, yc)
    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, xc, yc = _whctrs(ratio_anchors[i])
        out.append(_mkanchors(w * scales, h * scales, xc, yc))
    return np.vstack(out)


def shifted_anchors(feat_h: int, feat_w: int, feat_stride: int,
                    base_anchors: np.ndarray) -> jnp.ndarray:
    """All anchors on an (feat_h, feat_w) grid: (H*W*A, 4), ordered so that
    reshape to (H, W, A, 4) matches the reference's (K, A) layout
    [proposal_layer.py:80-96]."""
    anchors = jnp.asarray(base_anchors, dtype=jnp.float32)      # (A, 4)
    sx = jnp.arange(feat_w, dtype=jnp.float32) * feat_stride
    sy = jnp.arange(feat_h, dtype=jnp.float32) * feat_stride
    shift_x, shift_y = jnp.meshgrid(sx, sy)                      # (H, W)
    shifts = jnp.stack([shift_x, shift_y, shift_x, shift_y], axis=-1)
    all_anchors = anchors[None, None] + shifts[:, :, None, :]    # (H, W, A, 4)
    return all_anchors.reshape(-1, 4)
