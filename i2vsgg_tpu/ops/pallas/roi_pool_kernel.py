"""Pallas TPU kernel: exact max-RoIPool.

The XLA formulation of quantized-bin max pooling (masked select+reduce over
the full feature map per roi) is VPU-bound on redundant work — profiled at
~12ms/step in the fused serving program, reading every fmap cell H times per
roi. This kernel keeps the image's feature map resident in VMEM and visits
each feature-map ROW once per roi, accumulating it into the (at most two,
due to the floor/ceil overlap) row-bins it belongs to, with the column bins
resolved by a 7-way predicated max — total VMEM traffic ~= sum of roi areas
instead of R * PH * H * W.

Semantics identical to ``i2vsgg_tpu.ops.roi_pool.roi_pool`` (torchvision
ROIPool math, SURVEY.md §2.2): round() quantization, floor/ceil bin edges,
empty bins output 0. Bin bounds are precomputed in int32 on the host side
of the program (cheap jnp) and fed via scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def _bin_bounds(rois, spatial_scale, h, w, ph, pw):
    """Quantized bin bounds, exactly as ops/roi_pool.py computes them.

    Returns int32 arrays hstart/hend (R, PH), wstart/wend (R, PW).
    """
    start_w = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    start_h = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    end_w = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    end_h = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)
    roi_h = jnp.maximum(end_h - start_h + 1, 1)
    p_h = jnp.arange(ph, dtype=jnp.int32)
    p_w = jnp.arange(pw, dtype=jnp.int32)
    hstart = jnp.clip(p_h[None] * roi_h[:, None] // ph + start_h[:, None],
                      0, h)
    hend = jnp.clip(-((-(p_h[None] + 1) * roi_h[:, None]) // ph)
                    + start_h[:, None], 0, h)
    wstart = jnp.clip(p_w[None] * roi_w[:, None] // pw + start_w[:, None],
                      0, w)
    wend = jnp.clip(-((-(p_w[None] + 1) * roi_w[:, None]) // pw)
                    + start_w[:, None], 0, w)
    return hstart, hend, wstart, wend


def _kernel(hs_ref, he_ref, ws_ref, we_ref, bidx_ref,   # scalar prefetch
            fmap_ref, out_ref, acc_ref, *, h, w, ph, pw, r_tile, n):
    """One grid step = one tile of rois against one image's fmap (VMEM)."""
    bb = pl.program_id(0)
    rt = pl.program_id(1)

    def one_roi(j, _):
        r = bb * n + rt * r_tile + j      # global roi index (grouped layout)

        # (PH*PW, C) accumulator, NEG-initialized
        acc_ref[:, :] = jnp.full_like(acc_ref, NEG)

        def row_body(hh, _):
            # column stage: for each pw bin, max over its (dynamic) w range
            def col_bin(q, _):
                def w_body(ww, cur):
                    return jnp.maximum(cur, fmap_ref[0, hh, ww, :])

                cmax = jax.lax.fori_loop(
                    ws_ref[q, r], we_ref[q, r], w_body,
                    jnp.full((acc_ref.shape[1],), NEG, jnp.float32))

                # row stage: accumulate into every ph bin containing hh
                # (floor/ceil edges overlap, so membership is not unique)
                def p_body(p, _):
                    @pl.when(jnp.logical_and(hh >= hs_ref[p, r],
                                             hh < he_ref[p, r]))
                    def _():
                        slot = p * pw + q
                        acc_ref[slot, :] = jnp.maximum(acc_ref[slot, :],
                                                       cmax)
                    return 0

                jax.lax.fori_loop(0, ph, p_body, 0)
                return 0

            jax.lax.fori_loop(0, pw, col_bin, 0)
            return 0

        # only the roi's row span is visited
        jax.lax.fori_loop(hs_ref[0, r], he_ref[ph - 1, r], row_body, 0)

        # write out, mapping empty bins (still NEG) to 0
        out = acc_ref[:, :]
        out_ref[j, :, :] = jnp.where(out <= NEG / 2, 0.0, out)
        return 0

    jax.lax.fori_loop(0, r_tile, one_roi, 0)


@functools.partial(jax.jit,
                   static_argnames=("pooled_height", "pooled_width",
                                    "interpret"))
def roi_pool_pallas(features: jnp.ndarray, rois: jnp.ndarray,
                    pooled_height: int = 7, pooled_width: int = 7,
                    spatial_scale: float = 1.0 / 16.0,
                    interpret: bool = False) -> jnp.ndarray:
    """Max RoIPool via the Pallas kernel. Same contract as
    ``ops.roi_pool.roi_pool`` but requires per-image GROUPED rois
    (R = B * N, batch_idx = r // N).

    Returns (R, P, P, C) in the feature dtype.
    """
    b, h, w, c = features.shape
    r = rois.shape[0]
    assert r % b == 0, "rois must be grouped per image (R = B * N)"
    n = r // b
    ph, pw = pooled_height, pooled_width

    hs, he, ws, we = _bin_bounds(rois, spatial_scale, h, w, ph, pw)
    # SMEM arrays pad the minor dim to 128 — keep R (large, 128-friendly)
    # minor by transposing to (P, R)
    hs, he, ws, we = hs.T, he.T, ws.T, we.T
    bidx = (jnp.arange(r, dtype=jnp.int32) // n)

    r_tile = next(t for t in (8, 4, 2, 1) if n % t == 0)

    grid = (b, n // r_tile)
    kernel = functools.partial(_kernel, h=h, w=w, ph=ph, pw=pw,
                               r_tile=r_tile, n=n)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[pl.BlockSpec((1, h, w, c), lambda bb, rr, *_: (bb, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (r_tile, ph * pw, c),
                lambda bb, rr, *_: (bb * (n // r_tile) + rr, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ph * pw, c), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, ph * pw, c), jnp.float32),
        interpret=interpret,
    )(hs, he, ws, we, bidx, features.astype(jnp.float32))
    return out.reshape(r, ph, pw, c).astype(features.dtype)
