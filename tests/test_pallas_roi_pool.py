"""Pallas RoIPool kernel vs the jnp implementation (interpret mode on CPU;
the real kernel path is exercised by bench/serving on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from i2vsgg_tpu.ops.roi_pool import roi_pool
from i2vsgg_tpu.ops.pallas.roi_pool_kernel import roi_pool_pallas


def make(rng, b=2, h=14, w=19, c=256, n=8):
    feat = rng.randn(b, h, w, c).astype(np.float32)
    rois = np.zeros((b * n, 5), np.float32)
    for i in range(b * n):
        rois[i, 0] = i // n
        x1, y1 = rng.uniform(0, 200, 2)
        rois[i, 1:] = [x1, y1, x1 + rng.uniform(4, 150),
                       y1 + rng.uniform(4, 150)]
    return feat, rois


def test_pallas_roi_pool_matches_jnp(rng):
    feat, rois = make(rng)
    exp = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 7,
                              1.0 / 16.0))
    got = np.asarray(roi_pool_pallas(jnp.asarray(feat), jnp.asarray(rois),
                                     7, 7, 1.0 / 16.0, interpret=True))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_pallas_roi_pool_tiny_and_empty_bins(rng):
    feat = rng.randn(1, 16, 16, 128).astype(np.float32)
    rois = np.asarray([
        [0, 32.0, 32.0, 33.0, 33.0],      # ~1px roi -> many empty bins
        [0, 0.0, 0.0, 255.0, 255.0],      # whole image
        [0, 240.0, 240.0, 250.0, 250.0],  # bottom-right corner
        [0, 0.0, 0.0, 10.0, 10.0],
    ], np.float32)
    exp = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 7,
                              1.0 / 16.0))
    got = np.asarray(roi_pool_pallas(jnp.asarray(feat), jnp.asarray(rois),
                                     7, 7, 1.0 / 16.0, interpret=True))
    np.testing.assert_allclose(got, exp, rtol=1e-5)
