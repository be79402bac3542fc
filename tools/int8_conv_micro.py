"""Live-chip microbench: XLA int8 conv rate vs bf16 at layer3 shapes.

Answers two questions the round-4 backbone A/B raised (int8[l3,l4]
saved only 1.1 ms of an expected ~5-6 per b16 step):
  1. does `lax.conv_general_dilated` on int8 operands actually hit the
     2x int8 MXU rate on this chip, or does XLA lower it at ~bf16 rate?
  2. what does the dynamic-quant chain (f32 upcast -> max -> round ->
     int8 cast) cost per conv at fmap scale?

Timing follows bench.py's tunnel rule: completion is forced by a
device->host fetch of the last output (block_until_ready returns early
through the axon tunnel).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 16, 38, 60


def timeit(fn, *args, steps=30, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def conv(x, w, stride=1):
    k = w.shape[0]
    pet = jnp.int32 if x.dtype == jnp.int8 else None
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


@jax.jit
def quant_chain(x):
    xf = x.astype(jnp.float32)
    a_s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    return jnp.round(xf / a_s).astype(jnp.int8), a_s


@jax.jit
def quant_chain_bf16(x):
    a_s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8).astype(jnp.float32) / 127.0
    return jnp.round(x.astype(jnp.float32) / a_s).astype(jnp.int8), a_s


def main():
    rng = np.random.RandomState(0)
    rows = []
    for (cin, cout, k, label) in [
        (1024, 256, 1, "l3 1x1 in"),
        (256, 256, 3, "l3 3x3"),
        (256, 1024, 1, "l3 1x1 out"),
    ]:
        x = jnp.asarray(rng.randn(B, H, W, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, cin, cout), jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 127, (B, H, W, cin)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 127, (k, k, cin, cout)), jnp.int8)
        f = jax.jit(conv)
        t_bf = timeit(f, x, w)
        t_i8 = timeit(f, xq, wq)
        gf = 2 * B * H * W * cin * cout * k * k / 1e9
        rows.append((label, t_bf, t_i8, gf / t_bf, gf / t_i8))
        print(f"{label:12s} bf16 {t_bf:7.3f} ms ({gf/t_bf:6.1f} TF/s)  "
              f"int8 {t_i8:7.3f} ms ({gf/t_i8:6.1f} TOP/s)", flush=True)
    x = jnp.asarray(rng.randn(B, H, W, 1024), jnp.bfloat16)
    t_q = timeit(lambda v: quant_chain(v)[0], x)
    t_qb = timeit(lambda v: quant_chain_bf16(v)[0], x)
    print(f"quant chain (f32 upcast) {t_q:7.3f} ms;  "
          f"bf16-max variant {t_qb:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
