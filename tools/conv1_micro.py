"""Live-chip microbench: conv1 (7x7/2, C_in=3) cost at the b16 bench
shape, XLA direct vs the Pallas parity-plane kernel — sizing the single
biggest backbone line before any further kernel investment. Also times
layer2-shape 3x3 convs bf16 vs int8 (sizing the layer2 int8 prize).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jnp.sum(out[0].astype(jnp.float32))
                   if isinstance(out, tuple)
                   else jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jnp.sum(out[0].astype(jnp.float32))
                   if isinstance(out, tuple)
                   else jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    rng = np.random.RandomState(0)
    B = 16
    x = jnp.asarray(rng.randn(B, 600, 960, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64), jnp.float32)

    @jax.jit
    def direct(x, w, scale, bias):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y * scale.astype(jnp.bfloat16)
                           + bias.astype(jnp.bfloat16), 0)

    t = timeit(direct, x, w, scale, bias)
    print(f"conv1 XLA direct @b16: {t:.3f} ms", flush=True)

    from i2vsgg_tpu.ops.pallas.conv1_kernel import conv1_bn_relu_pallas
    t = timeit(lambda *a: conv1_bn_relu_pallas(*a), x, w, scale, bias)
    print(f"conv1 Pallas kernel @b16: {t:.3f} ms", flush=True)

    # conv1 int8 variants: direct, and pre-planed im2col+dot (K=160)
    xq = jnp.asarray(rng.randint(-123, 127, (B, 600, 960, 3)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 127, (7, 7, 3, 64)), jnp.int8)

    @jax.jit
    def direct_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    t = timeit(direct_i8, xq, wq)
    print(f"conv1 XLA direct int8 @b16: {t:.3f} ms", flush=True)

    # layer2 3x3 (16,75,120,128) bf16 vs int8 — sizing the l2 int8 prize
    x2 = jnp.asarray(rng.randn(B, 75, 120, 128), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.1, jnp.bfloat16)
    x2q = jnp.asarray(rng.randint(-127, 127, (B, 75, 120, 128)), jnp.int8)
    w2q = jnp.asarray(rng.randint(-127, 127, (3, 3, 128, 128)), jnp.int8)

    def conv(x, w):
        pet = jnp.int32 if x.dtype == jnp.int8 else None
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    f = jax.jit(conv)
    print(f"l2 3x3 bf16: {timeit(f, x2, w2):.3f} ms;  "
          f"int8: {timeit(f, x2q, w2q):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
