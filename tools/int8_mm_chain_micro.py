"""Live-chip IN-PROGRAM A/B: layer3's 1x1 convs as int8 matmuls.

Standalone microbenches through the axon tunnel pay ~0.64 ms RPC per
call (PERF.md round 2), which drowned the first attempt — this one
times a full 22-block layer3-shaped chain inside ONE jitted program
(lax.scan over stacked weights), so the variant delta is honest:

  A. bf16 1x1 convs (the current '@3x3' scope behavior)
  B. int8 1x1 convs (XLA conv lowering — measured slower round 4)
  C. int8 1x1 MATMULS: flatten (B*H*W, C) @ (C, F) int8->int32, fp32
     rescale (DenseInt8's scheme; dynamic per-tensor act scale)
  D. C with a STATIC act scale (quantize = pure elementwise, fusable)

The 3x3 conv of each block is kept int8 in ALL variants (it is int8 in
the shipped scope either way); the residual add stays bf16. If C/D win,
BNConv's int8 path routes 1x1 stride-1 convs through the matmul form
(quality already covered: the l3/l34 sim gates quantized 1x1s too).

SAFETY: never stride-slice an int8 array (crashed the TPU worker once,
PERF.md round 4) — this chain is stride-1 only.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 16, 38, 60
CIN, CMID = 1024, 256
NBLK = 22


def timeit(fn, *args, steps=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def quant(x):
    xf = x.astype(jnp.float32)
    a_s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    return jnp.round(xf / a_s).astype(jnp.int8), a_s


def conv(x, w, pet=None):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def conv3_i8(h):
    """3x3 mid conv, int8 in every variant (shipped scope)."""
    w3 = jnp.ones((3, 3, CMID, CMID), jnp.int8)
    hq, s = quant(h)
    y = conv(hq, w3, jnp.int32)
    return (y.astype(jnp.float32) * (s / 4096.0)).astype(jnp.bfloat16)


def make_chain(variant):
    @jax.jit
    def chain(x, w_in, w_out, a_scales):
        def blk(x, ws):
            wi, wo, a_in, a_out = ws
            if variant == "bf16conv":
                h = conv(x, wi[None, None].astype(jnp.bfloat16))
            elif variant == "int8conv":
                xq, s = quant(x)
                y = conv(xq, wi[None, None], jnp.int32)
                h = (y.astype(jnp.float32) * (s / 127.0)).astype(
                    jnp.bfloat16)
            else:
                if variant == "int8mm":
                    xq, s = quant(x)
                else:                       # int8mm_static
                    s = a_in
                    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                                  -127.0, 127.0).astype(jnp.int8)
                y = jax.lax.dot(xq.reshape(-1, CIN), wi,
                                preferred_element_type=jnp.int32)
                h = (y.astype(jnp.float32) * (s / 127.0)).astype(
                    jnp.bfloat16).reshape(B, H, W, CMID)
            h = conv3_i8(h)
            if variant == "bf16conv":
                o = conv(h, wo[None, None].astype(jnp.bfloat16))
            elif variant == "int8conv":
                hq, s2 = quant(h)
                y = conv(hq, wo[None, None], jnp.int32)
                o = (y.astype(jnp.float32) * (s2 / 127.0)).astype(
                    jnp.bfloat16)
            else:
                if variant == "int8mm":
                    hq, s2 = quant(h)
                else:
                    s2 = a_out
                    hq = jnp.clip(jnp.round(h.astype(jnp.float32) / s2),
                                  -127.0, 127.0).astype(jnp.int8)
                y = jax.lax.dot(hq.reshape(-1, CMID), wo,
                                preferred_element_type=jnp.int32)
                o = (y.astype(jnp.float32) * (s2 / 127.0)).astype(
                    jnp.bfloat16).reshape(B, H, W, CIN)
            return jnp.maximum(x + o, 0.0), 0
        x, _ = jax.lax.scan(blk, x, (w_in, w_out, a_scales[:, 0],
                                     a_scales[:, 1]))
        return jnp.sum(x.astype(jnp.float32))
    return chain


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, CIN), jnp.bfloat16)
    w_in = jnp.asarray(
        rng.randint(-127, 127, (NBLK, CIN, CMID)), jnp.int8)
    w_out = jnp.asarray(
        rng.randint(-127, 127, (NBLK, CMID, CIN)), jnp.int8)
    a_sc = jnp.asarray(rng.rand(NBLK, 2) + 0.5, jnp.float32)
    gf = NBLK * 2 * 2 * B * H * W * CIN * CMID / 1e9
    for v in ("bf16conv", "int8conv", "int8mm", "int8mm_static"):
        t = timeit(make_chain(v), x, w_in, w_out, a_sc)
        print(f"{v:14s} {t:7.3f} ms/chain  "
              f"(1x1s at {gf / t:6.1f} T{'OP' if 'int8' in v else 'F'}/s"
              " incl shared 3x3+quant overheads)", flush=True)


if __name__ == "__main__":
    main()
