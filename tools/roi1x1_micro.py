"""Roi-geometry 1x1 conv: int8 vs bf16 — layer4-on-rois shapes.

Round-4's 'int8 1x1 slower than bf16' measurement was at FMAP scale
(16x38x60). layer4-on-rois runs 1x1s at (B*128, 7, 7, C) — tiny
spatial, huge batch: effectively a (B*128*49, C) @ (C, F) matmul.
Different geometry, maybe different verdict.
"""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

def timeit(fn, *a, steps=30, warmup=5):
    out = None
    for _ in range(warmup): out = fn(*a)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps): out = fn(*a)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps * 1e3

R = 32 * 128          # b32 x 128 rois
for (cin, cout, name) in ((1024, 512, "l4 reduce"), (512, 2048, "l4 expand"),
                          (1024, 2048, "l4 shortcut")):
    xf = jnp.asarray(np.random.randn(R, 7, 7, cin), jnp.bfloat16)
    wf = jnp.asarray(np.random.randn(1, 1, cin, cout), jnp.bfloat16)
    xi = jnp.asarray(np.random.randint(-127, 127, (R, 7, 7, cin)), jnp.int8)
    wi = jnp.asarray(np.random.randint(-127, 127, (1, 1, cin, cout)), jnp.int8)

    @jax.jit
    def bf(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    tb = timeit(bf, xf, wf)
    ti = timeit(i8, xi, wi)
    print(f"{name:12s} ({cin}->{cout}): bf16 {tb:.2f} ms  int8 {ti:.2f} ms  "
          f"ratio {tb/ti:.2f}x", flush=True)
