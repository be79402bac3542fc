"""Live-chip microbench: int8 1x1 convs as flattened MXU matmuls.

tools/int8_conv_micro.py established (PERF.md round 4) that XLA's int8
CONV lowering is slower than bf16 for 1x1 kernels (l3 1x1-in 2.12 ms vs
1.07) while int8 MATMULS hit the 2x rate (DenseInt8 fc towers). A
1x1 stride-1 conv IS a matmul over the flattened spatial dim — this
measures whether an explicit reshape->dot->reshape int8 path recovers
the 2x for the trunk's 1x1 convs (the FLOP bulk layer3/layer4 int8
currently leaves in bf16 under the '@3x3' scope filter):

  (B*H*W, Cin) @ (Cin, Cout) int8 -> int32, fp32 rescale epilogue.

Also measures the stride-2 variant (1x1 s2 conv == subsample + matmul)
for layer3 block0, and the layer4 per-roi matmul shapes.

Timing follows bench.py's tunnel rule (device->host fetch to force
completion).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


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


def mm_i8(x, w, w_s, stride=1):
    """1x1 conv as int8 matmul + fp32 rescale epilogue (the production
    form: per-out-channel weight scale, per-tensor act scale folded)."""
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    b, h, wd, c = x.shape
    y = jax.lax.dot(x.reshape(b * h * wd, c), w,
                    preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * w_s).astype(jnp.bfloat16)
    return y.reshape(b, h, wd, w.shape[1])


def mm_bf(x, w, stride=1):
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    b, h, wd, c = x.shape
    return (x.reshape(b * h * wd, c) @ w).reshape(b, h, wd, w.shape[1])


def main():
    rng = np.random.RandomState(0)
    B, H, W = 16, 38, 60
    print("== full-image 1x1s (layer3 fmap scale) ==", flush=True)
    for (cin, cout, stride, hh, ww, label) in [
        (1024, 256, 1, H, W, "l3 1x1 in   "),
        (256, 1024, 1, H, W, "l3 1x1 out  "),
        (512, 256, 2, 2 * H, 2 * W, "l3 b0 s2 in "),
        (512, 1024, 2, 2 * H, 2 * W, "l3 b0 s2 ds "),
    ]:
        x = jnp.asarray(rng.randn(B, hh, ww, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(1, 1, cin, cout), jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 127, (B, hh, ww, cin)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 127, (cin, cout)), jnp.int8)
        w_s = jnp.asarray(rng.rand(cout), jnp.float32)
        fc = jax.jit(conv, static_argnames="stride")
        fm8 = jax.jit(mm_i8, static_argnames="stride")
        fmb = jax.jit(mm_bf, static_argnames="stride")
        t_bfc = timeit(lambda a, b: fc(a, b, stride=stride), x, w)
        t_i8c = timeit(lambda a, b: fc(a, b, stride=stride), xq,
                       wq[None, None])
        t_bfm = timeit(lambda a, b: fmb(a, b, stride=stride), x,
                       w[0, 0])
        t_i8m = timeit(lambda a, b: fm8(a, b, w_s, stride=stride), xq, wq)
        gf = 2 * B * (hh // stride) * (ww // stride) * cin * cout / 1e9
        print(f"{label} bf16conv {t_bfc:6.3f}  int8conv {t_i8c:6.3f}  "
              f"bf16mm {t_bfm:6.3f}  int8mm {t_i8m:6.3f} ms  "
              f"(int8mm {gf/t_i8m:6.1f} TOP/s)", flush=True)

    print("== per-roi head matmuls (layer4, 1024 rois = b16 x rpn64) ==",
          flush=True)
    for (rows, cin, cout, label) in [
        (1024 * 49, 1024, 512, "l4 b0 conv1 "),
        (1024 * 16, 1024, 2048, "l4 b0 ds    "),
        (1024 * 16, 512, 2048, "l4 conv3    "),
        (1024 * 16, 2048, 512, "l4 conv1    "),
    ]:
        x = jnp.asarray(rng.randn(rows, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(cin, cout), jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 127, (rows, cin)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 127, (cin, cout)), jnp.int8)
        w_s = jnp.asarray(rng.rand(cout), jnp.float32)

        @jax.jit
        def f_bf(a, b):
            return a @ b

        @jax.jit
        def f_i8(a, b, s):
            y = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * s).astype(jnp.bfloat16)

        t_bf = timeit(f_bf, x, w)
        t_i8 = timeit(f_i8, xq, wq, w_s)
        gf = 2 * rows * cin * cout / 1e9
        print(f"{label} bf16mm {t_bf:6.3f}  int8mm {t_i8:6.3f} ms  "
              f"(int8mm {gf/t_i8:6.1f} TOP/s)", flush=True)


if __name__ == "__main__":
    main()
