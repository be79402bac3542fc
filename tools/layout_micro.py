#!/usr/bin/env python
"""Live-chip costs of the XLA layout ops a conv1-v2 feed could use.

The conv1 kernel's real cost is the NHWC -> channels-major plane
construction (tools/conv1_attrib.py: 3.4 of ~8 ms). Candidate cheaper
feeds decompose it; this measures each piece IN ISOLATION (fresh
device output each step, scalar-fetch completion forcing):

  nchw      — (B, 2H, 2W, 3) -> (B, 3, 2H, 2W) transpose (minor-3 move)
  parity4   — 4x [:, py::2, px::2, :] strided slices (NHWC)
  stack_t   — (4, B, 3, Hq, Wq) -> (B, Hq, 12, Wq) transpose
              (minor dim Wq stays contiguous — should be ~memcpy)
  planes_v1 — the production v1 construction (pad + 6D transpose)
  out_fix   — (B, hop, 64, WP) -> (B, hop, WP, 64) minor-2D transpose
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes",
                    default="nchw,parity4,stack_t,planes_v1,out_fix")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    b = args.batch
    hq, wq = 312, 512
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(b, 2 * hq, 2 * wq, 3), jnp.bfloat16)
    pl4 = jnp.asarray(rng.randn(4, b, 3, hq, wq), jnp.bfloat16)
    yo = jnp.asarray(rng.randn(b, 304, 64, 512), jnp.bfloat16)

    def timeit(fn, *a):
        out = fn(*a)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        for _ in range(3):
            out = fn(*a)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*a)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.steps * 1e3

    @jax.jit
    def nchw(x):
        return x.transpose(0, 3, 1, 2) + jnp.bfloat16(1)

    @jax.jit
    def parity4(x):
        return sum(x[:, py::2, px::2, :] * jnp.bfloat16(py * 2 + px + 1)
                   for py in range(2) for px in range(2))

    @jax.jit
    def stack_t(p):
        # (4, B, 3, Hq, Wq) -> (B, Hq, 4, 3, Wq) -> (B, Hq, 12, Wq)
        return p.transpose(1, 3, 0, 2, 4).reshape(b, hq, 12, wq) \
            + jnp.bfloat16(1)

    @jax.jit
    def planes_v1(x):
        return (x.reshape(b, hq, 2, wq, 2, 3).transpose(0, 2, 4, 5, 1, 3)
                + jnp.bfloat16(1))

    @jax.jit
    def out_fix(y):
        return y.transpose(0, 1, 3, 2) + jnp.bfloat16(1)

    fns = {"nchw": (nchw, xp), "parity4": (parity4, xp),
           "stack_t": (stack_t, pl4), "planes_v1": (planes_v1, xp),
           "out_fix": (out_fix, yo)}
    for mode in args.modes.split(","):
        fn, a = fns[mode]
        print(f"{mode:10s} {timeit(fn, a):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
