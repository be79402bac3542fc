"""Pallas TPU kernel: RoIAlignAvg as in-VMEM MXU contractions.

XLA lowers the separable weight-matrix formulation of RoIAlignAvg
(``ops/roi_align.py``) into per-roi batched contractions with M=7 rows and
conv-style (..., 1) layouts — profiled at ~8ms/step (~1% MXU) in the fused
serving program. This kernel keeps the image's feature map resident in VMEM
and runs both contractions as ``pl.dot``:

    t   = (Ry_tile stacked)  @ fmap     -- (R_TILE*P, H) @ (H, W*C)
    out = Rx_r @ t_r^T(w-major)         -- (P, W) @ (W, P*C) per roi

with the roi-tile stacking recovering full MXU row utilization on the big
contraction. Semantics identical to ``roi_align_avg`` (same Ry/Rx weights,
built by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(fmap_ref, ry_ref, rx_ref, out_ref, t_ref, *,
            h, w, c, p, r_tile):
    """One grid step: R_TILE rois of one image."""
    fm = fmap_ref[0].reshape(h, w * c)
    ry = ry_ref[...].reshape(r_tile * p, h)
    t_ref[...] = jax.lax.dot(ry, fm,
                             preferred_element_type=jnp.float32)

    for r in range(r_tile):                        # static unroll
        tr = t_ref[r * p:(r + 1) * p, :].reshape(p, w, c)
        trw = tr.transpose(1, 0, 2).reshape(w, p * c)
        o = jax.lax.dot(rx_ref[r], trw,
                        preferred_element_type=jnp.float32)
        # o[j, (i, c)] -> out[i, j, c]
        out_ref[r] = o.reshape(p, p, c).transpose(1, 0, 2)


def pick_r_tile(n: int, h: int, w: int, c: int, p: int,
                budget: int = 14 * 2 ** 20):
    """Largest roi tile whose VMEM working set (fmap block + f32 scratch +
    out tile) fits; None if even r_tile=1 does not."""
    fmap_bytes = h * w * c * 2
    for t in (8, 4, 2, 1):
        if n % t:
            continue
        need = fmap_bytes + t * p * w * c * 4 + t * p * p * c * 4
        if need <= budget:
            return t
    return None


@functools.partial(jax.jit,
                   static_argnames=("p", "r_tile", "interpret"))
def roi_align_avg_pallas_core(features: jnp.ndarray, ry: jnp.ndarray,
                              rx: jnp.ndarray, p: int = 7,
                              r_tile: int | None = None,
                              interpret: bool = False) -> jnp.ndarray:
    """Apply precomputed separable interp matrices on the MXU.

    Args:
      features: (B, H, W, C).
      ry: (R, P, H) row weights; rx: (R, P, W) — per-image grouped
        (R = B * N, roi r belongs to image r // N).

    Returns (R, P, P, C) float32.
    """
    b, h, w, c = features.shape
    r = ry.shape[0]
    assert r % b == 0
    n = r // b
    if r_tile is None:
        r_tile = pick_r_tile(n, h, w, c, p) or 1
    grid = (b, n // r_tile)

    kernel = functools.partial(_kernel, h=h, w=w, c=c, p=p, r_tile=r_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bb, rr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, p, h),
                         lambda bb, rr: (bb * (n // r_tile) + rr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, p, w),
                         lambda bb, rr: (bb * (n // r_tile) + rr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_tile, p, p, c),
            lambda bb, rr: (bb * (n // r_tile) + rr, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r_tile * p, w * c), jnp.float32)],
        interpret=interpret,
    )(features, ry.astype(features.dtype), rx.astype(features.dtype))
