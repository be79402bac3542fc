#!/usr/bin/env python
"""A/B the INT8 conv1 Pallas kernel vs XLA direct conv1 vs the bf16
Pallas kernel, on the real TPU, at the serving shape.

Each arm is timed whole-program (jit of the op + on-device reduction);
completion forced by a device_get (PERF.md round-2 correction). The
int8 arm includes its full production preprocessing (offset quantize,
plane build) — the comparison is end-to-end per call.

Usage: python tools/microbench_conv1_int8.py [--batch 16]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--arms", default="xla,pallas_bf16,pallas_int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.pallas.conv1_kernel import conv1_bn_relu_pallas
    from i2vsgg_tpu.ops.pallas.conv1_int8_kernel import (
        conv1_bn_relu_int8_pallas, DEFAULT_PIXEL_MEANS)

    rng = np.random.RandomState(0)
    b, h, w_ = args.batch, args.height, args.width
    raw = rng.randint(0, 256, (b, h, w_, 3)).astype(np.float32)
    x = jnp.asarray(raw - np.asarray(DEFAULT_PIXEL_MEANS, np.float32))
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
    def pallas_bf16(x, w, scale, bias):
        return jnp.sum(conv1_bn_relu_pallas(
            x, w, scale, bias).astype(jnp.float32))

    @jax.jit
    def pallas_int8(x, w, scale, bias):
        return jnp.sum(conv1_bn_relu_int8_pallas(
            x, w, scale, bias).astype(jnp.float32))

    arms = {"xla": xla_path, "pallas_bf16": pallas_bf16,
            "pallas_int8": pallas_int8}
    for name in args.arms.split(","):
        fn = arms[name]
        out = fn(x, w, scale, bias)
        jax.device_get(out)                        # compile + settle
        t0 = time.time()
        for _ in range(args.steps):
            out = fn(x, w, scale, bias)
        jax.device_get(out)
        dt = (time.time() - t0) / args.steps * 1e3
        print(f"{name:12s} {dt:7.3f} ms / {b}x{h}x{w_}", flush=True)


if __name__ == "__main__":
    main()
