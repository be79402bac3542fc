"""Pallas RoIAlignAvg kernel vs the einsum formulation (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from i2vsgg_tpu.ops.roi_align import roi_align_avg_gather
from i2vsgg_tpu.ops.roi_align import roi_align_avg, _interp_matrix
from i2vsgg_tpu.ops.pallas.roi_align_kernel import roi_align_avg_pallas_core


def test_pallas_core_matches_einsum(rng):
    b, h, w, c, n, p = 2, 12, 18, 256, 8, 7
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    rois = np.zeros((b * n, 5), np.float32)
    for i in range(b * n):
        rois[i, 0] = i // n
        x1, y1 = rng.uniform(-20, 200, 2)
        rois[i, 1:] = [x1, y1, x1 + rng.uniform(4, 220),
                       y1 + rng.uniform(4, 220)]
    # reference: full einsum-path roi_align_avg (itself parity-tested
    # against the gather oracle)
    exp = np.asarray(roi_align_avg(feats, jnp.asarray(rois), p, p, 1 / 16.0))

    # rebuild the interp matrices exactly as roi_align_avg does
    x1s = rois[:, 1] / 16.0
    y1s = rois[:, 2] / 16.0
    x2s = rois[:, 3] / 16.0
    y2s = rois[:, 4] / 16.0
    bw = np.maximum(x2s - x1s + 1.0, 0.0) / p
    bh = np.maximum(y2s - y1s + 1.0, 0.0) / p
    gy = np.arange(p + 1, dtype=np.float32)
    ys = gy[None, :] * bh[:, None] + y1s[:, None]
    xs = gy[None, :] * bw[:, None] + x1s[:, None]
    ry = _interp_matrix(jnp.asarray(ys), h, p + 1, jnp.float32)
    rx = _interp_matrix(jnp.asarray(xs), w, p + 1, jnp.float32)
    avg = 0.5 * (np.eye(p + 1, dtype=np.float32)[:-1]
                 + np.eye(p + 1, dtype=np.float32)[1:])
    ry = jnp.einsum("ip,rph->rih", jnp.asarray(avg), ry)
    rx = jnp.einsum("jq,rqw->rjw", jnp.asarray(avg), rx)

    got = np.asarray(roi_align_avg_pallas_core(feats, ry, rx, p=p,
                                               interpret=True))
    np.testing.assert_allclose(got, exp, atol=2e-4)
