"""Pallas TPU kernel v2: ResNet conv1 (7x7 stride-2) — relayout-free core.

Where the v1 kernel's time actually goes (tools/conv1_attrib.py, live
chip, b16x600x960): the 49-tap im2col and the MXU dot are ~1 ms
together; the rest is (a) the XLA transpose that builds channels-major
parity planes (~2.8 ms, tools/layout_micro.py `planes_v1`), (b) the
in-kernel (rt, wp)->lanes merge for the big dot and the matching output
un-merge, and (c) the output NHWC transpose (~2.7 ms standalone,
`out_fix`). (a) is irreducible on this stack — Mosaic cannot stride-
slice lanes (`vector.extract_strided_slice` strides confined to [1,2)),
DMA cannot sub-tile-slice the NHWC minor dims (tile alignment), and
every XLA decomposition measured worse (strided parity slices 12.3 ms;
tools/layout_micro.py). v2 therefore keeps an XLA-side construction but
removes (b) and (c):

* planes are packed (B, Hq, 16, Wq) with m = (py*2+px)*3 + c on the
  SUBLANE dim — one XLA transpose, same cost class as v1's;
* im2col is 16 **tile-aligned strip copies** per row band (taps grouped
  by (dr2, dc2) = (dr//2, dc//2); each group is the full 16-sublane
  plane tile at one (row, lane) shift; K = 16 strips x 16 = 256 with
  zero weight rows absorbing invalid taps) into X (rt, 256, WP) whose
  untiled major dim is the output row;
* the dot runs per output row, TRANSPOSED — Y_r (WP, 64) =
  X[r]^T (WP, 256) @ W2^T — so the kernel writes NHWC-sliceable
  (B, Hop, WP, 64) directly: no lane merge, no un-merge, no output
  transpose op;
* the FrozenBN scale is FOLDED INTO W2 (conv is linear): epilogue is
  bias + relu only.

Replaces the same op as ops/pallas/conv1_kernel.py (reference semantics
[lib/model/faster_rcnn/resnet_instance_styleD_bilinear.py:366-369
conv1 7x7/2 pad 3 + frozen BN + relu]); serving/forward only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(planes_ref, w_ref, b_ref, out_ref, x, *, rt, wo, wp):
    t = pl.program_id(1)
    r0 = t * rt
    # im2col: 16 tile-aligned strip copies (K-strip s <- the full plane
    # tile at row shift dr2, lane shift dc2); X lanes beyond wo stay
    # stale — those output rows are sliced off by the caller
    for dr2 in range(4):
        for dc2 in range(4):
            s = dr2 * 4 + dc2
            x[:, 16 * s:16 * s + 16, 0:wo] = \
                planes_ref[0, pl.ds(r0 + dr2, rt), :, dc2:dc2 + wo]
    # per-row transposed MXU dots: X's untiled major dim IS the output
    # row, and (WP, 64) writes compose to NHWC with no transpose op
    for r in range(rt):
        y = jax.lax.dot_general(x[r], w_ref[...],
                                (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[0, r] = jnp.maximum(y + b_ref[...], 0.0).astype(jnp.bfloat16)


def _pack_weights(w, scale):
    """(64, 256) W2: K = s*16 + m, s = dr2*4 + dc2, m = (py*2+px)*3 + c,
    tap (dr, dc) = (2*dr2+py, 2*dc2+px); invalid-tap and m>=12 rows stay
    zero; FrozenBN scale folded in (conv is linear)."""
    wf = (w.astype(jnp.float32) * scale.astype(jnp.float32)).astype(
        jnp.bfloat16)
    kmap = np.zeros((256,), np.bool_)
    dr_of = np.zeros((256,), np.int64)
    dc_of = np.zeros((256,), np.int64)
    c_of = np.zeros((256,), np.int64)
    for dr2 in range(4):
        for dc2 in range(4):
            for py in range(2):
                for px in range(2):
                    dr, dc = 2 * dr2 + py, 2 * dc2 + px
                    if dr > 6 or dc > 6:
                        continue
                    for c in range(3):
                        k = (dr2 * 4 + dc2) * 16 + (py * 2 + px) * 3 + c
                        kmap[k] = True
                        dr_of[k], dc_of[k], c_of[k] = dr, dc, c
    w2 = jnp.zeros((64, 256), jnp.bfloat16)
    return w2.at[:, kmap].set(wf[dr_of[kmap], dc_of[kmap], c_of[kmap], :].T)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv1_bn_relu_pallas_v2(x, w, scale, bias, *, interpret: bool = False):
    """conv1(7x7, stride 2, pad 3) + per-channel scale/bias + relu.

    Args:
      x: (B, H, W, 3) images (any float dtype; computed in bf16).
      w: (7, 7, 3, 64) conv kernel (HWIO).
      scale, bias: (64,) folded FrozenBatchNorm affine.
    Returns: (B, Ho, Wo, 64) bf16 with Ho = (H+6-7)//2+1.
    """
    b, h, wd, cin = x.shape
    assert cin == 3 and w.shape == (7, 7, 3, 64)
    ho = (h - 1) // 2 + 1
    wo = (wd - 1) // 2 + 1
    wp = max(128, _round_up(wo, 128))
    rt = 16
    hop = _round_up(ho, rt)
    hq = hop + 8                      # band reads rows r0..r0+rt+3
    wq = max(128, _round_up(wo + 4, 128))

    # pad 3 top/left (reference pad), then ONE m-packed construction
    # transpose: (B, 2Hq, 2Wq, 3) -> (B, Hq, (py, px, c), Wq), sublane
    # dim zero-padded 12 -> 16
    xp = jnp.zeros((b, 2 * hq, 2 * wq, 3), jnp.bfloat16)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.bfloat16),
                                      (0, 3, 3, 0))
    planes = xp.reshape(b, hq, 2, wq, 2, 3).transpose(0, 1, 2, 4, 5, 3)
    planes = planes.reshape(b, hq, 12, wq)
    planes = jnp.concatenate(
        [planes, jnp.zeros((b, hq, 4, wq), jnp.bfloat16)], axis=2)

    w2 = _pack_weights(w, scale)
    b2 = bias.astype(jnp.float32)[None, :]                    # (1, 64)

    out = pl.pallas_call(
        functools.partial(_kernel, rt=rt, wo=wo, wp=wp),
        out_shape=jax.ShapeDtypeStruct((b, hop, wp, 64), jnp.bfloat16),
        grid=(b, hop // rt),
        in_specs=[
            pl.BlockSpec((1, hq, 16, wq), lambda bi, t: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 256), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, wp, 64), lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rt, 256, wp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hop * 64 * 256 * wp,
            bytes_accessed=b * (hq * wq * 16 * 2 + hop * 64 * wp * 2),
            transcendentals=0),
        interpret=interpret,
    )(planes, w2, b2)
    return out[:, :ho, :wo, :]
