#!/usr/bin/env python
"""Does Mosaic lower strided LANE slices of a value, and at what cost?

The conv1 feed's last unknown: NHWC rows are (w, px, c)-interleaved on
lanes (period 6). If an in-kernel stride-6 lane slice is cheap, the
whole XLA-side plane construction (~2.8 ms of the conv1 line) vanishes
— the kernel can phase-split contiguous rows itself. This times a
kernel that reads (rows, 6144) bands and emits the 6 phase planes.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    b, hq = args.batch, 304
    lanes = 6144                      # (w, px, c) interleaved, x2 row parity

    def kernel(x_ref, o_ref):
        v = x_ref[0]                                   # (16, 6144)
        outs = [jax.lax.slice(v, (0, p), (16, lanes - (6 - 1 - p)), (1, 6))
                for p in range(6)]                     # 6x (16, 1024)
        o_ref[0] = jnp.concatenate(outs, axis=1)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b * hq // 16, 16, 6144),
                                           jnp.bfloat16),
            grid=(b * hq // 16,),
            in_specs=[pl.BlockSpec((1, 16, lanes), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 16, 6144), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )(x)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b * hq // 16, 16, lanes), jnp.bfloat16)
    out = run(x)
    ref = np.concatenate([np.asarray(x)[:, :, p::6] for p in range(6)],
                         axis=2)
    np.testing.assert_array_equal(np.asarray(out), ref)
    print("correct", flush=True)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    for _ in range(3):
        out = run(x)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = run(x)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"stride-6 lane deinterleave of "
          f"{b * hq * lanes * 2 / 1e6:.0f} MB: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
