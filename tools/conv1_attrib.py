#!/usr/bin/env python
"""Attribute the conv1 Pallas kernel's time: im2col packing vs MXU dot.

Three kernel formulations closed the conv1 line (PERF.md round 4) but
none measured WHERE the parity-plane kernel's ~8 ms at b16 goes. This
runs structurally identical variants of ops/pallas/conv1_kernel:

  full      — the production kernel (pack 49 taps + one K=160 dot)
  dot_only  — X zero-initialized, tap loop skipped (plane block still
              DMA'd by the BlockSpec): dot + output write + grid cost
  pack_only — tap loop runs, dot replaced by a cheap K-reduction so the
              packing cannot be DCE'd: im2col cost + grid cost
  xla       — lax.conv_general_dilated direct (the bar to beat)

pack-share = (pack_only - dot_only_overhead) tells whether the tap-loop
VPU work is the bottleneck (restructure writes) or the band loads /
grid machinery are (restructure blocking).

Timing: device_get of a scalar reduction forces completion through the
axon tunnel (PERF.md round-2 correction).
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
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rt", type=int, default=0,
                    help="override the row-band height (grid-step count"
                         " probe: per-step fixed cost scales with"
                         " hop/rt)")
    ap.add_argument("--modes", default="xla,full,dot_only,pack_only",
                    help="also: dot2d (X scratch born (160, rt*wp) — no "
                         "reshape relayout), zeros_only (grid + X init + "
                         "output write floor, no dot)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from i2vsgg_tpu.ops.pallas import conv1_kernel as ck

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    def _kernel(planes_ref, w_ref, sb_ref, out_ref, x_ref, *, rt, wo, wp,
                mode):
        t = pl.program_id(1)
        r0 = pl.multiple_of(t * rt, 8)
        x_ref[...] = jnp.zeros_like(x_ref)
        if mode == "zeros3d_noin":
            y = jnp.maximum(x_ref[0:64].astype(jnp.float32)
                            * sb_ref[0][:, :, None] + sb_ref[1][:, :, None],
                            0.0)
            out_ref[0] = y.astype(jnp.bfloat16)
            return
        if mode == "zeros3d":
            # no merged-M dim anywhere: slice X 3D, epilogue, write — if
            # this collapses, the Y un-merge reshape is the whole cost
            y = jnp.maximum(x_ref[0:64].astype(jnp.float32)
                            * sb_ref[0][:, :, None] + sb_ref[1][:, :, None],
                            0.0)
            out_ref[0] = y.astype(jnp.bfloat16)
            return
        if mode in ("dot2d", "zeros_only"):
            # X born in dot layout (160, rt*wp): no packing, NO RESHAPE —
            # isolates the (160, rt, wp) -> (160, rt*wp) relayout cost
            if mode == "dot2d":
                y = jax.lax.dot_general(w_ref[...], x_ref[...],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:
                y = x_ref[0:64] .astype(jnp.float32)
            y = jnp.maximum(y * sb_ref[0] + sb_ref[1], 0.0)
            out_ref[0] = y.astype(jnp.bfloat16).reshape(64, rt, wp)
            return
        if mode != "dot_only":
            for py in range(2):
                for px in range(2):
                    band = planes_ref[0, py, px, :, pl.ds(r0, rt + 8), :]
                    for dc in range(px, 7, 2):
                        shifted = band[:, :, dc // 2:dc // 2 + wo]
                        for dr in range(py, 7, 2):
                            t3 = (dr * 7 + dc) * 3
                            x_ref[t3:t3 + 3, :, 0:wo] = \
                                shifted[:, dr // 2:dr // 2 + rt, :]
        x2 = x_ref[...].reshape(160, rt * wp)
        if mode == "pack_only":
            # cheap data dependence on every packed row: one VPU pass
            y = jnp.broadcast_to(jnp.sum(x2.astype(jnp.float32), axis=0,
                                         keepdims=True), (64, rt * wp))
        else:
            y = jax.lax.dot_general(w_ref[...], x2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        y = jnp.maximum(y * sb_ref[0] + sb_ref[1], 0.0)
        out_ref[0] = y.astype(jnp.bfloat16).reshape(64, rt, wp)

    def variant(x, w, scale, bias, mode):
        b, h, wd, _ = x.shape
        ho = (h - 1) // 2 + 1
        wo = (wd - 1) // 2 + 1
        wp = max(128, ck._round_up(wo, 128))
        rt = args.rt or ck._pick_rt(ho, wp)
        hop = ck._round_up(ho, rt)
        hq = ck._round_up(hop + 8, 8)
        wq = max(128, ck._round_up(wo + 4, 128))
        xp = jnp.zeros((b, 2 * hq, 2 * wq, 3), jnp.bfloat16)
        xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.bfloat16),
                                          (0, 3, 3, 0))
        planes = xp.reshape(b, hq, 2, wq, 2, 3).transpose(0, 2, 4, 5, 1, 3)
        w2 = jnp.zeros((64, 160), jnp.bfloat16)
        w2 = w2.at[:, :147].set(
            w.transpose(3, 0, 1, 2).reshape(64, 147).astype(jnp.bfloat16))
        sb = jnp.stack([scale.astype(jnp.float32),
                        bias.astype(jnp.float32)]).reshape(2, 64, 1)
        if mode == "zeros3d_noin":
            def _k2(w_ref, sb_ref, out_ref, x_ref):
                return _kernel(None, w_ref, sb_ref, out_ref, x_ref,
                               rt=rt, wo=wo, wp=wp, mode=mode)
            out = pl.pallas_call(
                _k2,
                out_shape=jax.ShapeDtypeStruct((b, 64, hop, wp),
                                               jnp.bfloat16),
                grid=(b, hop // rt),
                in_specs=[
                    pl.BlockSpec((64, 160), lambda bi, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, 64, 1), lambda bi, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 64, rt, wp),
                                       lambda bi, t: (bi, 0, t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((160, rt, wp), jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(w2, sb)
            return out[:, :, :ho, :wo].transpose(0, 2, 3, 1)
        out = pl.pallas_call(
            functools.partial(_kernel, rt=rt, wo=wo, wp=wp, mode=mode),
            out_shape=jax.ShapeDtypeStruct((b, 64, hop, wp), jnp.bfloat16),
            grid=(b, hop // rt),
            in_specs=[
                pl.BlockSpec((1, 2, 2, 3, hq, wq),
                             lambda bi, t: (bi, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 160), lambda bi, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 64, 1), lambda bi, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 64, rt, wp),
                                   lambda bi, t: (bi, 0, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(
                (160, rt * wp) if mode in ("dot2d", "zeros_only")
                else (160, rt, wp), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(planes, w2, sb)
        return out[:, :, :ho, :wo].transpose(0, 2, 3, 1)

    def timeit(fn, *a, steps=args.steps, warmup=3):
        out = fn(*a)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        for _ in range(warmup):
            out = fn(*a)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / steps * 1e3

    rng = np.random.RandomState(0)
    b, h, wd = args.batch, args.height, args.width
    x = jnp.asarray(rng.randn(b, h, wd, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64), jnp.float32)

    @jax.jit
    def xla(x, w, scale, bias):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y.astype(jnp.float32) * scale + bias,
                           0.0).astype(jnp.bfloat16)

    for mode in args.modes.split(","):
        if mode == "xla":
            ms = timeit(xla, x, w, scale, bias)
        elif mode == "v2":
            from i2vsgg_tpu.ops.pallas.conv1_v2_kernel import \
                conv1_bn_relu_pallas_v2
            ms = timeit(conv1_bn_relu_pallas_v2, x, w, scale, bias)
        else:
            fn = jax.jit(functools.partial(variant, mode=mode))
            ms = timeit(fn, x, w, scale, bias)
        print(f"{mode:10s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
