#!/usr/bin/env python
"""A/B the conv1 Pallas kernel vs XLA's direct conv on the real TPU.

Timing through the axon tunnel: force completion with a device_get of a
small on-device reduction (PERF.md round-2 measurement correction).

Usage: python tools/microbench_conv1.py [--batch 8 --height 600 --width 960]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.pallas.conv1_kernel import conv1_bn_relu_pallas

    rng = np.random.RandomState(0)
    b, h, w_ = args.batch, args.height, args.width
    x = jnp.asarray(rng.randn(b, h, w_, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    @jax.jit
    def xla_path(x, w, scale, bias):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y.astype(jnp.float32) * scale + bias, 0.0)
        return jnp.sum(y.astype(jnp.bfloat16).astype(jnp.float32))

    @jax.jit
    def pallas_path(x, w, scale, bias):
        y = conv1_bn_relu_pallas(x, w, scale, bias)
        return jnp.sum(y.astype(jnp.float32))

    for name, fn in [("xla", xla_path), ("pallas", pallas_path)]:
        out = fn(x, w, scale, bias)
        jax.device_get(out)                        # compile + settle
        t0 = time.time()
        for _ in range(args.steps):
            out = fn(x, w, scale, bias)
        jax.device_get(out)
        dt = (time.time() - t0) / args.steps * 1e3
        print(f"{name}: {dt:.3f} ms  (sum={float(out):.1f})", flush=True)

    a = np.asarray(jax.device_get(conv1_bn_relu_pallas(x, w, scale, bias)),
                   np.float32)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bref = np.asarray(jax.device_get(
        jnp.maximum(y * scale + bias, 0.0)), np.float32)
    err = np.abs(a - bref).max() / max(np.abs(bref).max(), 1e-6)
    print(f"max rel err vs fp32 conv: {err:.4f}")


if __name__ == "__main__":
    main()
