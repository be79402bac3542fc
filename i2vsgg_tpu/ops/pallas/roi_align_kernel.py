"""Pallas TPU kernel: RoIAlignAvg as in-VMEM MXU contractions.

The XLA einsum pair for the separable RoIAlignAvg formulation
(``ops/roi_align.py``) materializes the (N, P, H, C) intermediate in HBM —
~330MB per image at the 600x960 serving shape, making the op HBM-bound
(~5.3ms measured for 8x256 rois; the pure-FLOP cost is ~40 GFLOP ≈ 0.5ms).
This kernel keeps the intermediate in VMEM:

    t   = Ry_stacked @ fmap             -- (R_TILE*8, H) @ (H, W*CT)
    out = Rx_r @ t_r^T(w-major)         -- (P, W) @ (W, P*CT) per roi

Channel tiling (CT) bounds the VMEM working set so the roi tile can grow to
R_TILE=8..16, giving the big contraction 64..128 MXU rows. The row weights
arrive PRE-STACKED and PADDED to PS=8 rows/roi (p=7 real + 1 zero) from the
caller: Mosaic rejects the in-kernel (r_tile, p, h) -> (r_tile*p, h)
collapse, and block second-minor dims must be 8-divisible — (r_tile*PS, h)
blocks of a pre-stacked (R*PS, H) array need no reshape and are always
aligned. Output is written bf16 (the serving consumer casts anyway), halving
the HBM write. Semantics identical to ``roi_align_avg`` (same Ry/Rx
weights, built by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PS = 8          # sublane-aligned rows per roi (p=7 real + 1 zero pad)


def _kernel(fmap_ref, ry_ref, rx_ref, out_ref, t_ref, *,
            h, w, ct, p, r_tile):
    """One grid step: R_TILE rois x CT channels of one image.

    fmap_ref: (1, h, w, ct); ry_ref: (r_tile*PS, h) pre-stacked row weights;
    rx_ref: (r_tile, p, w); out_ref: (r_tile, p, p, ct);
    t_ref scratch: (r_tile*PS, w*ct) f32.
    """
    fm = fmap_ref[0].reshape(h, w * ct)
    t_ref[...] = jax.lax.dot(ry_ref[...], fm,
                             preferred_element_type=jnp.float32)

    # second contraction as ONE roi-batched dot (a per-roi unrolled loop of
    # (7, w) @ (w, p*ct) dots measured 2x SLOWER than the XLA einsum pair —
    # thousands of serial tiny-M ops; the batched dot_general lowers to a
    # single MXU pass). All reshapes/transposes below are minor-preserving
    # (ct stays the lane dim) or sublane-aligned splits (PS = 8).
    tw = t_ref[...].reshape(r_tile, PS, w, ct)[:, :p]
    tw = tw.transpose(0, 2, 1, 3).reshape(r_tile, w, p * ct)
    o = jax.lax.dot_general(
        rx_ref[...].astype(jnp.float32), tw,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (r, pj, p*ct)
    # o[r, j, (i, c)] -> out[r, i, j, c]
    out_ref[...] = o.reshape(r_tile, p, p, ct).transpose(0, 2, 1, 3).astype(
        out_ref.dtype)


def pick_tiles(n: int, h: int, w: int, c: int, p: int,
               budget: int = 14 * 2 ** 20):
    """(r_tile, c_tile) whose VMEM working set fits the 16M scoped-vmem
    limit, preferring large roi tiles (MXU rows on the big dot). In/out
    blocks are double-buffered by the pipeline, scratch is not."""
    best = None
    for rt in (16, 8, 4, 2, 1):
        if n % rt:
            continue
        for ct in (512, 256, 128):
            if c % ct:
                continue
            need = (2 * h * w * ct * 2                # fmap blocks (bf16)
                    + rt * PS * w * ct * 4            # t scratch (f32)
                    + 2 * rt * p * p * ct * 2)        # out blocks (bf16)
            if need <= budget:
                if best is None or rt > best[0]:
                    best = (rt, ct)
                break
    return best


@functools.partial(jax.jit,
                   static_argnames=("p", "r_tile", "c_tile", "interpret"))
def roi_align_avg_pallas_core(features: jnp.ndarray, ry: jnp.ndarray,
                              rx: jnp.ndarray, p: int = 7,
                              r_tile: int | None = None,
                              c_tile: int | None = None,
                              interpret: bool = False) -> jnp.ndarray:
    """Apply precomputed separable interp matrices on the MXU.

    Args:
      features: (B, H, W, C).
      ry: (R, P, H) row weights; rx: (R, P, W) — per-image grouped
        (R = B * N, roi r belongs to image r // N).

    Returns (R, P, P, C) in the feature dtype (bf16 in serving — halves the
    HBM write vs the einsum path's f32 intermediate).
    """
    b, h, w, c = features.shape
    r = ry.shape[0]
    assert r % b == 0
    n = r // b
    if r_tile is None or c_tile is None:
        picked = pick_tiles(n, h, w, c, p)
        assert picked is not None, "no VMEM-feasible tiling"
        r_tile, c_tile = picked
    grid = (b, n // r_tile, c // c_tile)

    # pre-stack + pad on the XLA side: (R, P, H) -> (R*PS, H) so kernel
    # blocks are aligned (r_tile*PS, h) slices with no in-kernel shape cast
    ry_pad = jnp.pad(ry, ((0, 0), (0, PS - p), (0, 0)))
    ry_stacked = ry_pad.reshape(r * PS, h).astype(features.dtype)

    kernel = functools.partial(_kernel, h=h, w=w, ct=c_tile, p=p,
                               r_tile=r_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c_tile),
                         lambda bb, rr, cc: (bb, 0, 0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile * PS, h),
                         lambda bb, rr, cc: (bb * (n // r_tile) + rr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, p, w),
                         lambda bb, rr, cc: (bb * (n // r_tile) + rr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_tile, p, p, c_tile),
            lambda bb, rr, cc: (bb * (n // r_tile) + rr, 0, 0, cc),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), features.dtype),
        scratch_shapes=[pltpu.VMEM((r_tile * PS, w * c_tile), jnp.float32)],
        interpret=interpret,
    )(features, ry_stacked, rx.astype(features.dtype))
