#!/usr/bin/env python
"""A/B the RoIAlignAvg formulations on the real chip (perf triage tool):
XLA einsum pair vs the Pallas stacked-dot kernel, at the fused-bench shapes
(det: 8 images x 300 rois on 38x60x1024; sgg: 8 x 256)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(name, fn, *args, steps=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / steps
    print(f"{name:36s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.roi_align import roi_align_avg, _interp_matrix
    from i2vsgg_tpu.ops.pallas.roi_align_kernel import (
        roi_align_avg_pallas_core, pick_tiles)

    rng = np.random.RandomState(0)
    P = 7
    for tag, (B, H, W, C, N) in {
        "det  8img x 304roi": (8, 38, 60, 1024, 304),
        "sgg  8img x 256roi": (8, 38, 60, 1024, 256),
    }.items():
        fmap = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
            jnp.bfloat16)
        R = B * N
        rois = np.zeros((R, 5), np.float32)
        rois[:, 0] = np.arange(R) // N
        rois[:, 1] = rng.uniform(0, 700, R)
        rois[:, 2] = rng.uniform(0, 400, R)
        rois[:, 3] = rois[:, 1] + rng.uniform(30, 250, R)
        rois[:, 4] = rois[:, 2] + rng.uniform(30, 200, R)
        rois = jnp.asarray(rois)

        einsum_fn = jax.jit(lambda f, r: roi_align_avg(f, r, P, P, 1 / 16.0))

        @jax.jit
        def pallas_fn(f, rois_):
            scale = 1.0 / 16.0
            x1 = rois_[:, 1] * scale
            y1 = rois_[:, 2] * scale
            x2 = rois_[:, 3] * scale
            y2 = rois_[:, 4] * scale
            bin_w = jnp.maximum(x2 - x1 + 1.0, 0.0) / P
            bin_h = jnp.maximum(y2 - y1 + 1.0, 0.0) / P
            gy = jnp.arange(P + 1, dtype=jnp.float32)
            ys = gy[None, :] * bin_h[:, None] + y1[:, None]
            xs = gy[None, :] * bin_w[:, None] + x1[:, None]
            ry = _interp_matrix(ys, H, P + 1, jnp.float32)
            rx = _interp_matrix(xs, W, P + 1, jnp.float32)
            avg = 0.5 * (jnp.eye(P + 1, dtype=jnp.float32)[:-1]
                         + jnp.eye(P + 1, dtype=jnp.float32)[1:])
            ry = jnp.einsum("ip,rph->rih", avg, ry)
            rx = jnp.einsum("jq,rqw->rjw", avg, rx)
            return roi_align_avg_pallas_core(f, ry, rx, P)

        a = timeit(f"{tag} einsum", einsum_fn, fmap, rois)
        b = timeit(f"{tag} pallas", pallas_fn, fmap, rois)
        ref = np.asarray(einsum_fn(fmap, rois), np.float32)
        got = np.asarray(pallas_fn(fmap, rois), np.float32)
        err = np.abs(ref - got).max()
        print(f"{tag} max|diff|={err:.5f}  speedup={a / b:.2f}x", flush=True)
        rt, ct = pick_tiles(N, H, W, C, P)
        print(f"{tag} r_tile={rt} c_tile={ct}")


if __name__ == "__main__":
    main()
