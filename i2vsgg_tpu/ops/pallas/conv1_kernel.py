"""Pallas TPU kernel: ResNet conv1 (7x7 stride-2) as a dense MXU matmul.

XLA's direct lowering of conv1 runs at ~4% MXU utilization (~4.9 ms of the
39.6 ms serving step at 8x600x960): with C_in=3 the systolic array's K
dimension is starved, and every XLA-level rewrite tried (im2col+matmul,
space-to-depth, NCHW) measured equal or worse (PERF.md round-2). This
kernel restructures the op so the MXU sees one well-shaped matmul:

* outside the kernel, the (pad-3) input is split into FOUR parity planes
  (channels-major) — a stride-2 7x7 conv is a unit-stride read from parity
  plane (dr%2, dc%2) at offset (dr//2, dc//2), so all in-kernel band reads
  are contiguous;
* the kernel im2cols a row band into X (K=160, RT*WP) in VMEM — K is the
  49 taps x 3 channels (147) zero-padded to 160, the minor dim is the
  output width padded to a lane multiple — and computes
  Y = W (64, 160) @ X in ONE dot at N in the tens of thousands;
* the FrozenBatchNorm affine + ReLU that always follow conv1 are fused in
  (per-channel scale/bias on the sublane axis).

Output is channels-major (B, 64, Ho, WP); the caller slices/transposes
back to NHWC (cheap relayout vs. the matmul win).

Round-4 attribution (PERF.md "conv1 ATTRIBUTION") measured that the
kernel-proper is ~1 ms — the cost is the XLA transpose that BUILDS the
parity planes (~2.8-3.4 ms at b16) plus the output NHWC fix-up. Both are
layout costs, not compute, so the only remaining lever is the serving
INPUT contract: ship the parity planes from the HOST (the loader packs
them with numpy while resizing/normalizing — a memory shuffle the host
does once per frame, off the device's critical path). This module
therefore splits into:

* ``conv1_plane_geometry(h, w)`` — the static plane/output geometry;
* ``pack_conv1_planes`` (jnp) / ``pack_conv1_planes_np`` (numpy, for the
  host-side loader) — identical layouts, test-pinned against each other;
* ``Conv1Planes`` — a pytree wrapper carrying the planes plus the static
  image (h, w) so a jitted serving program can accept pre-packed planes
  in place of NHWC images (``ResNetTrunk`` dispatches on the type);
* ``conv1_bn_relu_pallas_planes`` — the pallas_call on pre-built planes;
* ``conv1_bn_relu_pallas`` — the original device-side entry
  (= pack + planes call), kept for the non-contract-changing path.
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


def _pick_rt(ho: int, wp: int) -> int:
    """Largest multiple of 8 (Mosaic sublane tiling) keeping the X scratch
    under ~4.5 MB; output rows are padded up to a multiple of it."""
    budget = int(4.5e6)
    best = 8
    for rt in range(8, max(ho, 8) + 8, 8):
        if 160 * rt * wp * 2 <= budget:
            best = rt
    return best


class Conv1Geometry(tuple):
    """Static plane/output geometry for an (h, w) input image.

    Fields: ho/wo (conv1 output), wp (lane-padded output width), rt (row
    band), hop (band-padded output rows), hq/wq (per-plane dims). Shared by
    the jnp and numpy packers and the kernel launch so the layouts can
    never drift apart.
    """
    __slots__ = ()
    ho = property(lambda s: s[0])
    wo = property(lambda s: s[1])
    wp = property(lambda s: s[2])
    rt = property(lambda s: s[3])
    hop = property(lambda s: s[4])
    hq = property(lambda s: s[5])
    wq = property(lambda s: s[6])


def conv1_plane_geometry(h: int, w: int) -> Conv1Geometry:
    ho = (h - 1) // 2 + 1
    wo = (w - 1) // 2 + 1
    wp = max(128, _round_up(wo, 128))
    rt = _pick_rt(ho, wp)
    hop = _round_up(ho, rt)
    # pad 3 left/top; right/bottom so parity planes cover every tap of
    # every (possibly padded) output row; plane rows 8-aligned + 8 slack
    # for the aligned band loads, plane cols lane-padded
    hq = _round_up(hop + 8, 8)
    wq = max(128, _round_up(wo + 4, 128))
    return Conv1Geometry((ho, wo, wp, rt, hop, hq, wq))


def pack_conv1_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) image batch -> (B, 2, 2, 3, Hq, Wq) bf16 parity planes
    (channels-major; pad 3 top/left baked in)."""
    b, h, wd, _ = x.shape
    g = conv1_plane_geometry(h, wd)
    xp = jnp.zeros((b, 2 * g.hq, 2 * g.wq, 3), jnp.bfloat16)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.bfloat16),
                                      (0, 3, 3, 0))
    planes = xp.reshape(b, g.hq, 2, g.wq, 2, 3)
    return planes.transpose(0, 2, 4, 5, 1, 3)


def pack_conv1_planes_np(x: np.ndarray, *, native: bool = True) -> np.ndarray:
    """Numpy mirror of :func:`pack_conv1_planes` for the HOST-side loader
    (test-pinned bit-identical — both round f32->bf16 nearest-even).

    Routes through the C++ packer (``runtime.pack_planes``, ~3x the numpy
    throughput on one core and threaded on real loader hosts) when the
    native lib builds; the numpy path is the fallback and the oracle the
    native packer is test-pinned against (``native=False`` forces it)."""
    b, h, wd, _ = x.shape
    g = conv1_plane_geometry(h, wd)
    if native:
        from i2vsgg_tpu import runtime
        out = runtime.pack_planes(np.asarray(x, np.float32), g.hq, g.wq)
        if out is not None:
            return out
    import ml_dtypes
    xp = np.zeros((b, 2 * g.hq, 2 * g.wq, 3), ml_dtypes.bfloat16)
    xp[:, 3:3 + h, 3:3 + wd, :] = x.astype(ml_dtypes.bfloat16)
    planes = xp.reshape(b, g.hq, 2, g.wq, 2, 3)
    return np.ascontiguousarray(planes.transpose(0, 2, 4, 5, 1, 3))


@jax.tree_util.register_pytree_node_class
class Conv1Planes:
    """Pre-packed conv1 parity planes standing in for an NHWC image batch.

    Carries the planes array plus the STATIC source image (h, w) so shape
    arithmetic downstream of conv1 still works; exposes ``.shape`` =
    (B, H, W, 3) so callers that only read the batch/image dims (e.g.
    ``FasterRCNN_DA.train_source``) need no changes. ``ResNetTrunk``
    dispatches on this type and skips the on-device plane construction —
    the serving-input-contract lever (PERF.md round-4 conv1 attribution:
    the XLA transpose that builds the planes is the cost, not the kernel).
    """

    def __init__(self, planes, h: int, w: int):
        self.planes = planes
        self.h = int(h)
        self.w = int(w)

    @classmethod
    def pack(cls, x) -> "Conv1Planes":
        b, h, w, _ = x.shape
        if isinstance(x, np.ndarray):
            return cls(pack_conv1_planes_np(x), h, w)
        return cls(pack_conv1_planes(x), h, w)

    @property
    def shape(self):
        return (self.planes.shape[0], self.h, self.w, 3)

    def tree_flatten(self):
        return (self.planes,), (self.h, self.w)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def _kernel(planes_ref, w_ref, sb_ref, out_ref, x_ref, *, rt, ho, wo, wp,
            out_dtype):
    """One grid step = one row band of one image.

    planes_ref: (1, 2, 2, 3, Hq, Wq) bf16 parity planes (Wq lane-padded)
    w_ref:      (64, 160) bf16
    sb_ref:     (2, 64, 1) f32 — folded bn scale / bias
    out_ref:    (1, 64, rt, wp)
    x_ref:      (160, rt, wp) bf16 VMEM scratch (im2col)

    The dynamic row start is the 8-aligned r0 only; per-tap offsets
    (dr//2, dc//2 in 0..3) are STATIC slices of the loaded band value
    (Mosaic requires dynamic sublane starts to be 8-multiples).
    """
    t = pl.program_id(1)
    r0 = pl.multiple_of(t * rt, 8)
    x_ref[...] = jnp.zeros_like(x_ref)          # K pad rows + col pad
    for py in range(2):
        for px in range(2):
            band = planes_ref[0, py, px, :, pl.ds(r0, rt + 8), :]
            # hoist the (unaligned) LANE slice out of the tap loop: one
            # rotation per (px, dc//2) instead of one per (dr, dc) —
            # Mosaic lane rotations dominated the per-tap form
            for dc in range(px, 7, 2):
                shifted = band[:, :, dc // 2:dc // 2 + wo]   # (3,rt+8,wo)
                for dr in range(py, 7, 2):
                    t3 = (dr * 7 + dc) * 3
                    x_ref[t3:t3 + 3, :, 0:wo] = \
                        shifted[:, dr // 2:dr // 2 + rt, :]
    x2 = x_ref[...].reshape(160, rt * wp)
    y = jax.lax.dot_general(w_ref[...], x2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(y * sb_ref[0] + sb_ref[1], 0.0)        # bn + relu
    y = y.reshape(64, rt, wp)
    # ZERO the row/col padding (bn bias would otherwise leave relu(bias)
    # there): the unpooled caller slices it off anyway, and the fused
    # stem-maxpool path POOLS ACROSS it — post-relu values are >= 0, so
    # max over {reals..., 0} == max(reals): zero pad is bitwise-equal to
    # the reference's ceil-mode -inf pad.
    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (rt, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, wp), 1)
    y = jnp.where((rows < ho) & (cols < wo), y, 0.0)
    out_ref[0] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv1_bn_relu_pallas(x, w, scale, bias, *, interpret: bool = False):
    """conv1(7x7, stride 2, pad 3) + per-channel scale/bias + relu.

    Args:
      x: (B, H, W, 3) images (any float dtype; computed in bf16).
      w: (7, 7, 3, 64) conv kernel (HWIO).
      scale, bias: (64,) folded FrozenBatchNorm affine.
    Returns: (B, Ho, Wo, 64) bf16 with Ho = (H+6-7)//2+1.
    """
    b, h, wd, cin = x.shape
    assert cin == 3 and w.shape == (7, 7, 3, 64)
    return conv1_bn_relu_pallas_planes(pack_conv1_planes(x), h, wd,
                                       w, scale, bias, interpret=interpret)


def _conv1_cm(planes, h: int, wd: int, w, scale, bias, interpret: bool):
    """The pallas_call itself: channels-major zero-padded output
    (B, 64, hop, wp) — the padding beyond (ho, wo) is exact zeros."""
    g = conv1_plane_geometry(h, wd)
    ho, wo, wp, rt, hop = g.ho, g.wo, g.wp, g.rt, g.hop
    b = planes.shape[0]
    assert planes.shape[1:] == (2, 2, 3, g.hq, g.wq), (planes.shape, g)

    # (64, 160) weight: K index = (dr*7+dc)*3 + ch
    w2 = jnp.zeros((64, 160), jnp.bfloat16)
    w2 = w2.at[:, :147].set(
        w.transpose(3, 0, 1, 2).reshape(64, 147).astype(jnp.bfloat16))
    sb = jnp.stack([scale.astype(jnp.float32),
                    bias.astype(jnp.float32)]).reshape(2, 64, 1)

    hq, wq = planes.shape[-2:]
    return pl.pallas_call(
        functools.partial(_kernel, rt=rt, ho=ho, wo=wo, wp=wp,
                          out_dtype=jnp.bfloat16),
        out_shape=jax.ShapeDtypeStruct((b, 64, hop, wp), jnp.bfloat16),
        grid=(b, hop // rt),
        in_specs=[
            pl.BlockSpec((1, 2, 2, 3, hq, wq), lambda bi, t: (bi, 0, 0, 0,
                                                              0, 0),
                         memory_space=pltpu.VMEM),
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
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 64 * 160 * hop * wp,
            bytes_accessed=b * (hq * wq * 12 * 2 + 64 * hop * wp * 2),
            transcendentals=0),
        interpret=interpret,
    )(planes, w2, sb)


@functools.partial(jax.jit, static_argnames=("h", "wd", "interpret"))
def conv1_bn_relu_pallas_planes(planes, h: int, wd: int, w, scale, bias, *,
                                interpret: bool = False):
    """The pallas_call on pre-built parity planes (see module docstring).

    Args:
      planes: (B, 2, 2, 3, Hq, Wq) bf16 from pack_conv1_planes[_np](x).
      h, wd: the ORIGINAL image dims (static; fix the geometry).
    Returns: (B, Ho, Wo, 64) bf16.
    """
    g = conv1_plane_geometry(h, wd)
    out = _conv1_cm(planes, h, wd, w, scale, bias, interpret)
    # back to NHWC, padding sliced off
    return out[:, :, :g.ho, :g.wo].transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("h", "wd", "interpret"))
def conv1_stem_pallas_planes(planes, h: int, wd: int, w, scale, bias, *,
                             interpret: bool = False):
    """conv1 + bn + relu + the caffe-convention stem maxpool (k3 s2 pad 0
    CEIL mode), pooled in the kernel's CHANNELS-MAJOR layout — the NHWC
    fix-up transpose then moves 4x fewer bytes (the `out_fix` line of the
    conv1 attribution, ~2.7 ms/16f standalone).

    Bitwise-equal to conv1_bn_relu_pallas_planes + nn.max_pool(ceil):
    the kernel zeroes the (ho, wo) padding, post-relu values are >= 0, so
    max over a window that spills into zero padding equals the ceil-mode
    -inf-padded max (tests/test_pallas_conv1.py pins this).

    Returns: (B, Hp, Wp, 64) bf16 with Hp = (Ho - 2) // 2 + 1.
    """
    g = conv1_plane_geometry(h, wd)
    ho, wo = g.ho, g.wo
    out = _conv1_cm(planes, h, wd, w, scale, bias, interpret)
    pho = (ho - 2) // 2 + 1                    # caffe ceil-mode output dims
    pwo = (wo - 2) // 2 + 1
    # windows may read up to 2*(p-1)+3 rows/cols; the kernel's zero pad
    # usually covers it — top up with explicit zeros when hop/wp are tight
    pad_h = max(0, 2 * (pho - 1) + 3 - out.shape[2])
    pad_w = max(0, 2 * (pwo - 1) + 3 - out.shape[3])
    if pad_h or pad_w:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    pooled = jax.lax.reduce_window(
        out, jnp.asarray(0.0, out.dtype), jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding="VALID")
    return pooled[:, :, :pho, :pwo].transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv1_stem_pallas(x, w, scale, bias, *, interpret: bool = False):
    """Image-batch form of :func:`conv1_stem_pallas_planes`."""
    b, h, wd, cin = x.shape
    assert cin == 3 and w.shape == (7, 7, 3, 64)
    return conv1_stem_pallas_planes(pack_conv1_planes(x), h, wd,
                                    w, scale, bias, interpret=interpret)
