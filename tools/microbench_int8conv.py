#!/usr/bin/env python
"""Where does the int8-trunk win go? A/B bottleneck-block variants on-chip.

The round-4 staged bisect measured the int8[layer3,layer4] trunk at only
~0.9 ms/16-frame-step faster than bf16 (25.3 vs 26.2 ms) while the 2x v5e
int8 MXU rate on layer3's FLOP bulk is worth ~8 ms. This microbench times
ONE layer3-shaped bottleneck chain (1x1 1024->256, 3x3 256->256, 1x1
256->1024, residual relu) in four precision regimes to locate the loss:

  bf16        — production fp path
  int8-dyn    — the shipped path: per-conv dynamic per-tensor activation
                scale (abs-max reduce + requantize pass per conv),
                pre-quantized weights
  int8-static — fixed activation scales (no abs-max pass; round/clip fuses
                into the producer) — the static-calibration candidate
  int8-chain  — activations STAY int8 across the whole block (requantize
                int32->int8 per conv, residual in int8) — the rate ceiling

Timing through the axon tunnel: force completion with a device_get of a
small on-device reduction (PERF.md round-2 measurement correction);
chains are scanned over per-block weight stacks so weight streaming from
HBM is realistic (loop-invariant weights would hide it in VMEM).
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
    ap.add_argument("--height", type=int, default=38)
    ap.add_argument("--width", type=int, default=60)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    b, h, w_, m = args.batch, args.height, args.width, args.blocks
    C, P = 1024, 256
    x0 = jnp.asarray(rng.randn(b, h, w_, C).astype(np.float32))

    def mkw(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    w1 = jnp.asarray(np.stack([mkw(1, 1, C, P) for _ in range(m)]))
    w2 = jnp.asarray(np.stack([mkw(3, 3, P, P) for _ in range(m)]))
    w3 = jnp.asarray(np.stack([mkw(1, 1, P, C) for _ in range(m)]))

    def quant_w(w):   # per-out-channel symmetric, like BNConv/transform
        f = w.shape[-1]
        s = np.maximum(np.abs(np.asarray(w).reshape(m, -1, f)).max(1),
                       1e-8) / 127.0
        q = np.round(np.asarray(w) / s[:, None, None, None]).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    q1, s1 = quant_w(w1)
    q2, s2 = quant_w(w2)
    q3, s3 = quant_w(w3)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, k):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(k // 2, k // 2)] * 2, dimension_numbers=dn)

    def iconv(xq, wq, k):
        return lax.conv_general_dilated(
            xq, wq, (1, 1), [(k // 2, k // 2)] * 2, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    bf16 = jnp.bfloat16

    @jax.jit
    def chain_bf16(x):
        wb = (w1.astype(bf16), w2.astype(bf16), w3.astype(bf16))

        def step(xc, ws):
            a, bw, c = ws
            y = jnp.maximum(conv(xc, a, 1), 0)
            y = jnp.maximum(conv(y, bw, 3), 0)
            y = conv(y, c, 1)
            return jnp.maximum(xc + y, 0), 0.
        y, _ = lax.scan(step, x.astype(bf16), wb)
        return jnp.sum(y.astype(jnp.float32))

    def dynq(x):
        xf = x.astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        return jnp.round(xf / a).astype(jnp.int8), a

    @jax.jit
    def chain_int8_dyn(x):
        def step(xc, ws):
            a1, sc1, a2, sc2, a3, sc3 = ws
            xq, s = dynq(xc)
            y = (iconv(xq, a1, 1).astype(jnp.float32) * (s * sc1))
            y = jnp.maximum(y, 0).astype(bf16)
            yq, s = dynq(y)
            y = (iconv(yq, a2, 3).astype(jnp.float32) * (s * sc2))
            y = jnp.maximum(y, 0).astype(bf16)
            yq, s = dynq(y)
            y = (iconv(yq, a3, 1).astype(jnp.float32) * (s * sc3))
            return jnp.maximum(xc + y.astype(bf16), 0), 0.
        y, _ = lax.scan(step, x.astype(bf16),
                        (q1, s1, q2, s2, q3, s3))
        return jnp.sum(y.astype(jnp.float32))

    A = 0.05                                      # fixed activation scale

    def staq(x):
        xf = x.astype(jnp.float32)
        return jnp.clip(jnp.round(xf / A), -127, 127).astype(jnp.int8)

    @jax.jit
    def chain_int8_static(x):
        def step(xc, ws):
            a1, sc1, a2, sc2, a3, sc3 = ws
            y = (iconv(staq(xc), a1, 1).astype(jnp.float32) * (A * sc1))
            y = jnp.maximum(y, 0).astype(bf16)
            y = (iconv(staq(y), a2, 3).astype(jnp.float32) * (A * sc2))
            y = jnp.maximum(y, 0).astype(bf16)
            y = (iconv(staq(y), a3, 1).astype(jnp.float32) * (A * sc3))
            return jnp.maximum(xc + y.astype(bf16), 0), 0.
        y, _ = lax.scan(step, x.astype(bf16),
                        (q1, s1, q2, s2, q3, s3))
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def chain_int8_chain(x):
        def requant(y32):                          # int32 -> int8, rough
            return jnp.clip(y32 // 1024, -127, 127).astype(jnp.int8)

        def step(xq, ws):
            a1, _, a2, _, a3, _ = ws
            y = requant(iconv(xq, a1, 1))
            y = requant(iconv(y, a2, 3))
            y = requant(iconv(y, a3, 1))
            return jnp.clip(xq.astype(jnp.int32) + y, -127, 127
                            ).astype(jnp.int8), 0.
        y, _ = lax.scan(step, staq(x), (q1, s1, q2, s2, q3, s3))
        return jnp.sum(y.astype(jnp.float32))

    for name, fn in [("bf16", chain_bf16), ("int8-dyn", chain_int8_dyn),
                     ("int8-static", chain_int8_static),
                     ("int8-chain", chain_int8_chain)]:
        out = fn(x0)
        jax.device_get(out)                        # compile + settle
        t0 = time.time()
        for _ in range(args.steps):
            out = fn(x0)
        jax.device_get(out)
        dt = (time.time() - t0) / args.steps
        print(f"{name:12s} {dt * 1e3:8.3f} ms/chain "
              f"({dt * 1e3 / m:6.3f} ms/block)", flush=True)


if __name__ == "__main__":
    main()
