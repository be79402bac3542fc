"""RoIAlign / RoIPool parity tests against independent numpy loop
implementations of the reference kernels' math:

* RoIAlign: single-sample bilinear, bin = roi/(P-1), zero outside image
  (lib/model/roi_align/src/roi_align_kernel.cu:15-73)
* RoIAlignAvg: (P+1)x(P+1) grid + 2x2 stride-1 avg pool
  (lib/model/roi_align/modules/roi_align.py:18-29)
* RoIPool: round()-quantized bins, floor/ceil edges, empty bins -> 0
  (torchvision/detectron2 semantics of lib/model/roi_layers/roi_pool.py)
"""

import numpy as np
import jax.numpy as jnp

from i2vsgg_tpu.ops.roi_align import roi_align, roi_align_avg
from i2vsgg_tpu.ops.roi_pool import roi_pool


def np_roi_align(feat, rois, ah, aw, scale):
    """feat: (B, H, W, C) numpy. Direct port of the CUDA kernel math."""
    b, H, W, C = feat.shape
    R = rois.shape[0]
    out = np.zeros((R, ah, aw, C), np.float32)
    for n in range(R):
        bi = int(rois[n, 0])
        x1, y1, x2, y2 = rois[n, 1:] * scale
        rw = max(x2 - x1 + 1.0, 0.0)
        rh = max(y2 - y1 + 1.0, 0.0)
        bh = rh / (ah - 1.0)
        bw = rw / (aw - 1.0)
        for ph in range(ah):
            for pw in range(aw):
                h = ph * bh + y1
                w = pw * bw + x1
                if h < 0 or h >= H or w < 0 or w >= W:
                    continue
                hs = int(min(np.floor(h), H - 2))
                ws = int(min(np.floor(w), W - 2))
                hr = h - hs
                wr = w - ws
                out[n, ph, pw] = (feat[bi, hs, ws] * (1 - hr) * (1 - wr)
                                  + feat[bi, hs, ws + 1] * (1 - hr) * wr
                                  + feat[bi, hs + 1, ws] * hr * (1 - wr)
                                  + feat[bi, hs + 1, ws + 1] * hr * wr)
    return out


def np_roi_pool(feat, rois, P, scale):
    b, H, W, C = feat.shape
    R = rois.shape[0]
    out = np.zeros((R, P, P, C), np.float32)
    for n in range(R):
        bi = int(rois[n, 0])
        sw = round(rois[n, 1] * scale)
        sh = round(rois[n, 2] * scale)
        ew = round(rois[n, 3] * scale)
        eh = round(rois[n, 4] * scale)
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        for ph in range(P):
            for pw in range(P):
                hs = int(np.clip(np.floor(ph * rh / P) + sh, 0, H))
                he = int(np.clip(np.ceil((ph + 1) * rh / P) + sh, 0, H))
                ws = int(np.clip(np.floor(pw * rw / P) + sw, 0, W))
                we = int(np.clip(np.ceil((pw + 1) * rw / P) + sw, 0, W))
                if he <= hs or we <= ws:
                    continue
                out[n, ph, pw] = feat[bi, hs:he, ws:we].max(axis=(0, 1))
    return out


def make_inputs(rng, B=2, H=24, W=31, C=8, R=12):
    feat = rng.randn(B, H, W, C).astype(np.float32)
    bi = rng.randint(0, B, R).astype(np.float32)
    x1 = rng.uniform(0, (W - 4) * 16, R)
    y1 = rng.uniform(0, (H - 4) * 16, R)
    x2 = x1 + rng.uniform(8, 3 * 16, R)
    y2 = y1 + rng.uniform(8, 3 * 16, R)
    rois = np.stack([bi, x1, y1, x2, y2], 1).astype(np.float32)
    return feat, rois


def test_roi_align_matches_cuda_math(rng):
    feat, rois = make_inputs(rng)
    exp = np_roi_align(feat, rois, 8, 8, 1 / 16.0)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 8, 8, 1 / 16.0))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_roi_align_out_of_image_taps_are_zero(rng):
    feat = np.ones((1, 10, 10, 3), np.float32)
    # roi extending beyond image: taps past W/H must be exactly 0
    rois = np.array([[0, 100.0, 100.0, 200.0, 200.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 7, 1 / 16.0))
    exp = np_roi_align(feat, rois, 7, 7, 1 / 16.0)
    np.testing.assert_allclose(got, exp)


def test_roi_align_avg(rng):
    # roi_align_avg's MXU formulation requires per-image grouped rois
    # (R = B*N, batch_idx = r // N) — the layout every caller produces
    feat, rois = make_inputs(rng)
    rois[:, 0] = np.repeat(np.arange(2), 6)
    grid = np_roi_align(feat, rois, 8, 8, 1 / 16.0)
    exp = 0.25 * (grid[:, :-1, :-1] + grid[:, 1:, :-1]
                  + grid[:, :-1, 1:] + grid[:, 1:, 1:])
    got = np.asarray(roi_align_avg(jnp.asarray(feat), jnp.asarray(rois), 7, 7, 1 / 16.0))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_roi_align_avg_gather_oracle_random_batch_idx(rng):
    # the gather oracle supports arbitrary batch_idx layouts
    from i2vsgg_tpu.ops.roi_align import roi_align_avg_gather
    feat, rois = make_inputs(rng)
    grid = np_roi_align(feat, rois, 8, 8, 1 / 16.0)
    exp = 0.25 * (grid[:, :-1, :-1] + grid[:, 1:, :-1]
                  + grid[:, :-1, 1:] + grid[:, 1:, 1:])
    got = np.asarray(roi_align_avg_gather(jnp.asarray(feat),
                                          jnp.asarray(rois), 7, 7, 1 / 16.0))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_roi_pool_matches_torchvision_math(rng):
    feat, rois = make_inputs(rng)
    exp = np_roi_pool(feat, rois, 7, 1 / 16.0)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 7, 1 / 16.0))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_roi_pool_tiny_roi_nonempty(rng):
    feat = rng.randn(1, 16, 16, 4).astype(np.float32)
    rois = np.array([[0, 32.0, 32.0, 33.0, 33.0]], np.float32)  # ~1px roi
    exp = np_roi_pool(feat, rois, 7, 1 / 16.0)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 7, 7, 1 / 16.0))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_roi_align_avg_matmul_matches_gather(rng):
    """The MXU (weight-matrix) RoIAlignAvg must equal the 4-corner-gather
    oracle exactly (same single-tap semantics), including out-of-image and
    degenerate rois, for multi-image grouped batches."""
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.roi_align import roi_align_avg, roi_align_avg_gather

    b, h, w, c = 3, 12, 17, 8
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    n = 9
    rois = np.zeros((b * n, 5), np.float32)
    for i in range(b * n):
        rois[i, 0] = i // n
        x1, y1 = rng.uniform(-30, 200, 2)
        rois[i, 1:] = [x1, y1, x1 + rng.uniform(1, 250),
                       y1 + rng.uniform(1, 250)]
    rois[0, 1:] = [0, 0, 0, 0]                   # degenerate
    out_m = roi_align_avg(feats, jnp.asarray(rois), 7, 7, 1.0 / 16.0)
    out_g = roi_align_avg_gather(feats, jnp.asarray(rois), 7, 7, 1.0 / 16.0)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g),
                               atol=2e-5)
