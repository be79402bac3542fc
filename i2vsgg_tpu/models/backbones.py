"""Backbones: ResNet-50/101 (frozen-BN Faster R-CNN trunk) and VGG16.

TPU-native reimplementation of the reference's backbone assembly
(``lib/model/faster_rcnn/resnet_instance_styleD_bilinear.py:148-443``):

* caffe-convention Bottleneck — stride sits on the FIRST 1x1 conv
  (``resnet_instance_styleD_bilinear.py:186`` "# change") — matching the
  caffe-pretrained weights the reference loads.
* all BatchNorms run frozen (inference stats, no grads), reproducing the
  reference's ``set_bn_fix`` + ``train()`` override (`:392-439`); here a
  frozen BN is a pure affine op, so train==eval by construction.
* the trunk is split exactly like ``RCNN_base`` = conv1..layer3 with the
  layer2 output tapped as the style-discriminator input (`extract_feature`,
  `:412-420`), and ``RCNN_top`` = layer4 + spatial mean (`_head_to_tail`,
  `:441-443`).

Layout is NHWC (channels-last = TPU lane dimension); convs run in
``compute_dtype`` (bf16 by default) with fp32 params, letting the MXU do the
heavy lifting.
"""

from __future__ import annotations

import os as _os

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

RESNET_STAGES = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    # tiny debug/test variant (full channel widths, one block per stage)
    10: (1, 1, 1, 1),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics AND frozen affine params.

    The reference freezes every BN's params and runs them in eval mode
    (``set_bn_fix``/``set_bn_eval``); equivalently this is a constant affine
    transform. Params live in the regular "params" collection (so checkpoint
    porting is uniform) but are stop-gradient'ed, so no optimizer masking is
    needed for correctness.
    """
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mul = jax.lax.stop_gradient(scale * jax.lax.rsqrt(var + self.eps))
        add = jax.lax.stop_gradient(bias - mean * mul)
        if x is None:                 # folded-affine query (pallas conv1)
            return mul, add
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class Conv1S2D(nn.Module):
    """ResNet conv1 (7x7/s2 on RGB) computed as a space-to-depth conv.

    Packing 2x2 input pixels into channels (C_in=12) and running the
    zero-padded 8x8 kernel as a 4x4 stride-1 conv on the packed grid
    computes the IDENTICAL function (the MLPerf ResNet space-to-depth
    trick). A/B on the fused 8x600x960 serving bench measured the DIRECT
    conv slightly faster end-to-end (169.7 vs 163.0 fps — XLA's own conv1
    handling beats the extra reshape/pad passes here), so s2d is opt-in
    via I2VSGG_S2D=1. The param keeps the canonical (7, 7, 3, 64) layout
    either way.
    """
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, 64)).astype(self.dtype)
        if return_kernel:             # raw param for the pallas conv1 path
            return w
        b, h, wd, _ = x.shape
        import os as _os
        if h % 2 or wd % 2 or _os.environ.get("I2VSGG_S2D") != "1":
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # pad so every 8-wide window starts at an even offset: output o
        # needs x[2o-3 .. 2o+3]; with 4 left-pad the window [2o-4, 2o+4)
        # covers it, and the kernel gains a leading zero row/col
        xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        hp, wp = xp.shape[1], xp.shape[2]
        y = xp.reshape(b, hp // 2, 2, wp // 2, 2, 3)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 12)
        k8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))      # (8, 8, 3, 64)
        ks = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        ks = ks.reshape(4, 4, 12, 64)
        return jax.lax.conv_general_dilated(
            y, ks, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BNConv(nn.Module):
    """No-bias conv with a queryable raw kernel (call with ``x=None``) so
    FrozenBN affines can be folded into fused Pallas kernels. Param
    name/shape/init match ``nn.Conv`` ('kernel', (k, k, in, out),
    lecun_normal) — checkpoints are unchanged. On tiny spatial grids
    (per-roi head inputs) a 1x1 stride-1 conv runs as an explicit
    (R*HW, C) @ (C, F) matmul — the flattened NHWC view is free, and the
    GEMM shape is perfect (two conv rewrites of the 3x3 measured SLOWER;
    see PERF.md)."""
    features: int
    in_features: int
    kernel: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x=None):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, self.in_features, self.features))
        if x is None:
            return w
        if _os.environ.get("I2VSGG_INT8_CALIB"):
            # static-scale calibration capture (tools/calibrate_act_
            # scales.py): record this conv's input abs-max; the tool runs
            # the fp model with mutable=["intermediates"] over calibration
            # batches and maxes over batches per module path
            self.sow("intermediates", "act_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.asarray(0.0, jnp.float32))
        if w.dtype == jnp.int8:
            # pre-quantized serving tree (utils.params.quantize_trunk_
            # params): the per-step weight-quant chain is hoisted to load
            # time; integer taps are bit-identical to the on-the-fly path
            # below, so the committed quality gates carry over.
            w_s = self.param("kernel_scale", nn.initializers.ones,
                             (self.features,))
            f32 = jnp.float32
            small = x.shape[1] * x.shape[2] <= 64
            if small and k == 1 and self.stride == 1:
                # safety guard — the transform skips small-grid 1x1s; if
                # one slips through, dequantize rather than miscompute
                r, h, wd, c = x.shape
                wd_ = (w.astype(f32).reshape(c, self.features)
                       * w_s).astype(self.dtype)
                return (x.reshape(r * h * wd, c) @ wd_).reshape(
                    r, h, wd, self.features)
            if self.has_variable("params", "act_scale"):
                # STATIC activation scale (calibrated offline,
                # utils.params.quantize_trunk_params act_scales=...):
                # the dynamic per-tensor abs-max is a full extra HBM
                # pass over the fmap per conv that cannot fuse with its
                # consumer (the reduction must finish before the
                # divide); measured ~1.3 ms standalone at 1024-ch b16
                # fmaps (tools/int8_conv_micro.py) — it is why the
                # dynamic int8[l3,l4] scope returned only 1.1 ms of the
                # expected 5-6. A static scale makes the quantize pure
                # elementwise (fusable); outliers beyond the calibrated
                # range saturate at +-127 (symmetric clamp).
                a_s = self.param("act_scale", nn.initializers.ones, ())
                x_q = jnp.clip(jnp.round(x.astype(f32) / a_s),
                               -127.0, 127.0)
            else:
                xf = x.astype(f32)
                a_s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
                x_q = jnp.round(xf / a_s)
            if _os.environ.get("I2VSGG_INT8_PREQ_SIM"):
                # fake-quant twin of the int8 conv below (same integer
                # taps, fp32 conv) — XLA:CPU runs int8 convs ~45x slower
                # than fp, so quality gates eval THIS path; equivalence
                # is test-pinned (tests/test_int8_trunk.py)
                y = jax.lax.conv_general_dilated(
                    x_q, w.astype(f32),
                    window_strides=(self.stride, self.stride),
                    padding=[(k // 2, k // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return (y * (a_s * w_s)).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x_q.astype(jnp.int8), w,
                window_strides=(self.stride, self.stride),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (y.astype(f32) * (a_s * w_s)).astype(self.dtype)
        small = x.shape[1] * x.shape[2] <= 64     # per-roi head grids
        if small and k == 1 and self.stride == 1:
            r, h, wd, c = x.shape
            out = (x.reshape(r * h * wd, c)
                   @ w.reshape(c, self.features).astype(self.dtype))
            return out.reshape(r, h, wd, self.features)
        mode = _os.environ.get("I2VSGG_INT8_TRUNK") or ""
        # optional layer scoping: "<kind>:tok1,tok2" quantizes only convs
        # whose module path contains a token (e.g. "sim:layer1,layer2" =
        # partial-depth int8 — the round-4 full-trunk A/B FAILED its
        # quality gate at -0.018 target mAP, so depth-restricted variants
        # are the re-gate candidates; tools/quant_trunk_ab.py --mode).
        mode, _, only = mode.partition(":")
        if only:
            toks = [t for t in only.split(",") if t]
            # "@3x3" filter token: quantize only the 3x3 convs — the
            # live-chip microbench (tools/int8_conv_micro.py, PERF.md r4)
            # measured XLA's int8 1x1 convs SLOWER than bf16 at fmap
            # scale (2.12 vs 1.07 ms) while 3x3s run 1.7x faster, so the
            # profitable scope is kernel-size- as well as layer-scoped.
            if "@3x3" in toks and k != 3:
                mode = ""
            ptoks = [t for t in toks if not t.startswith("@")]
            path = "/".join(self.scope.path)
            if ptoks and not any(t in path for t in ptoks):
                mode = ""
        if mode in ("1", "sim"):
            # int8 MXU conv (serving-only, forward-only; v5e runs int8 at
            # 2x the bf16 rate — PERF.md "Path to 500" #1's precision
            # lever). Per-output-channel symmetric weight quantization +
            # per-tensor dynamic activation quantization, fp32 rescale
            # after the int32 accumulate — same scheme as DenseInt8
            # (models/sgg.py). Quality-gate: tools/quant_trunk_ab.py.
            # mode "sim" = fake-quant: the SAME quantized integer taps
            # convolved in fp32 (int8 convs run ~45x slower than bf16 on
            # XLA:CPU, so the CPU quality gate uses sim; equivalence to
            # the int8 path up to accumulator rounding is test-pinned in
            # tests/test_int8_trunk.py).
            f32 = jnp.float32
            wf = w.astype(f32)
            w_s = jnp.maximum(
                jnp.max(jnp.abs(wf.reshape(-1, self.features)), axis=0),
                1e-8) / 127.0                                  # (F,)
            w_q = jnp.round(wf / w_s)
            xf = x.astype(f32)
            a_s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
            x_q = jnp.round(xf / a_s)
            if mode == "sim":
                y = jax.lax.conv_general_dilated(
                    x_q, w_q, window_strides=(self.stride, self.stride),
                    padding=[(k // 2, k // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return (y * (a_s * w_s)).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x_q.astype(jnp.int8), w_q.astype(jnp.int8),
                window_strides=(self.stride, self.stride),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (y.astype(f32) * (a_s * w_s)).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    """Caffe-convention bottleneck (stride on the first 1x1 conv).

    setup-style so the fused serving path can read raw kernels + folded
    BN affines via ``folded()`` without running the block."""
    planes: int
    in_features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        p, dt = self.planes, self.dtype
        self.conv1 = BNConv(p, self.in_features, 1, self.stride, dt)
        self.bn1 = FrozenBatchNorm(p)
        self.conv2 = BNConv(p, p, 3, 1, dt)
        self.bn2 = FrozenBatchNorm(p)
        self.conv3 = BNConv(p * 4, p, 1, 1, dt)
        self.bn3 = FrozenBatchNorm(p * 4)
        if self.downsample:
            self.downsample_conv = BNConv(p * 4, self.in_features, 1,
                                          self.stride, dt)
            self.downsample_bn = FrozenBatchNorm(p * 4)

    def __call__(self, x):
        residual = x
        out = nn.relu(self.bn1(self.conv1(x)))
        out = nn.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample:
            residual = self.downsample_bn(self.downsample_conv(x))
        return nn.relu(out + residual)

    def folded(self):
        """(w1', b1, w3', b3, w2', b2) for the fused identity-chain kernel
        (requires stride 1, no downsample)."""
        from i2vsgg_tpu.ops.pallas.bottleneck_kernel import fold_block_params
        assert not self.downsample and self.stride == 1
        return fold_block_params(self.conv1(None), self.bn1(None),
                                 self.conv2(None), self.bn2(None),
                                 self.conv3(None), self.bn3(None))


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = Bottleneck(self.planes, cin, self.stride, downsample=True,
                       dtype=self.dtype, name="block0")(x)
        tail = [Bottleneck(self.planes, self.planes * 4, dtype=self.dtype,
                           name=f"block{i}")
                for i in range(1, self.blocks)]
        if tail and _use_fused_chain(x, self.planes):
            from i2vsgg_tpu.ops.pallas.bottleneck_kernel import \
                bottleneck_chain_pallas
            w1, b1, w3, b3, w2, b2 = (jnp.stack(t) for t in zip(
                *[blk.folded() for blk in tail]))
            return bottleneck_chain_pallas(
                x, w1, b1, w3, b3, w2, b2,
                interpret=jax.default_backend() != "tpu").astype(self.dtype)
        for blk in tail:
            x = blk(x)
        return x


def _use_fused_chain(x, planes) -> bool:
    """Gate for the VMEM-resident identity-chain kernel: opt-in serving
    path (forward-only), full-image fmaps that fit the budget."""
    import os as _os
    if _os.environ.get("I2VSGG_PALLAS_BOTTLENECK") != "1":
        return False
    from i2vsgg_tpu.ops.pallas.bottleneck_kernel import chain_vmem_bytes
    b, h, w, c = x.shape
    if c != planes * 4 or c % 128 or planes % 128:
        return False
    # layer3 at the 600x960 serving shape estimates ~14.9 MB; Mosaic's
    # hard limit is ~16 MB/core
    return chain_vmem_bytes(h, w, c, planes) <= int(15.2e6)


class ResNetTrunk(nn.Module):
    """conv1..layer3 (stride 16) with the layer2 tap.

    ``__call__(images)`` -> (c4_feat [B,H/16,W/16,1024],
                             c3_tap [B,H/8,W/8,512])
    """
    depth: int = 101
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n1, n2, n3, _ = RESNET_STAGES[self.depth]
        import os as _os
        from i2vsgg_tpu.ops.pallas.conv1_kernel import Conv1Planes
        # the Pallas stem fuses the caffe ceil-mode maxpool in the
        # kernel's channels-major layout (bitwise-equal post-relu; the
        # NHWC fix-up transpose then moves 4x fewer bytes). Opt-out env
        # for on-chip A/Bs.
        fused_pool = _os.environ.get("I2VSGG_CONV1_FUSED_POOL", "1") == "1"
        pooled = False
        if isinstance(x, Conv1Planes):
            # host-packed parity planes (serving input-contract lever —
            # the on-device plane construction, ~2.8 ms/16f of XLA
            # transpose, already happened on the host loader): straight
            # to the planes-fed Pallas conv1.
            from i2vsgg_tpu.ops.pallas.conv1_kernel import (
                conv1_bn_relu_pallas_planes, conv1_stem_pallas_planes)
            w = Conv1S2D(dtype=self.dtype, name="conv1")(
                None, return_kernel=True)
            mul, add = FrozenBatchNorm(64, name="bn1")(None)
            fn = (conv1_stem_pallas_planes if fused_pool
                  else conv1_bn_relu_pallas_planes)
            x = fn(x.planes, x.h, x.w, w, mul, add,
                   interpret=jax.default_backend() != "tpu"
                   ).astype(self.dtype)
            pooled = fused_pool
        elif _os.environ.get("I2VSGG_PALLAS_CONV1") == "1":
            # Pallas parity-plane matmul kernel (serving path; forward
            # only). Params keep the exact conv1/bn1 tree.
            from i2vsgg_tpu.ops.pallas.conv1_kernel import (
                conv1_bn_relu_pallas, conv1_stem_pallas)
            x = x.astype(self.dtype)
            w = Conv1S2D(dtype=self.dtype, name="conv1")(
                None, return_kernel=True)
            mul, add = FrozenBatchNorm(64, name="bn1")(None)
            fn = conv1_stem_pallas if fused_pool else conv1_bn_relu_pallas
            x = fn(x, w, mul, add,
                   interpret=jax.default_backend() != "tpu"
                   ).astype(self.dtype)
            pooled = fused_pool
        else:
            x = Conv1S2D(dtype=self.dtype, name="conv1")(x.astype(self.dtype))
            x = FrozenBatchNorm(64, name="bn1")(x)
            x = nn.relu(x)
        # caffe-convention maxpool: k3 s2 pad 0 CEIL mode (the reference's
        # '# change', resnet_instance_styleD_bilinear.py:228) — NOT
        # torchvision's pad 1 floor. Ceil mode = implicit -inf pad at the
        # END when (dim - 3) is odd; out = (dim - 2) // 2 + 1.
        if not pooled:
            pe = [(0, 1 if d % 2 == 0 else 0) for d in x.shape[1:3]]
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pe)
        x = ResNetStage(64, n1, 1, self.dtype, name="layer1")(x)
        tap = ResNetStage(128, n2, 2, self.dtype, name="layer2")(x)
        x = ResNetStage(256, n3, 2, self.dtype, name="layer3")(tap)
        return x, tap


class ResNetHead(nn.Module):
    """layer4 over pooled ROI features + global spatial mean -> (R, 2048).
    [_head_to_tail, resnet_instance_styleD_bilinear.py:441-443]

    ``first_stride=2`` (default) is the reference layout: 7x7 pooled input,
    block0 strides to 4x4. The fused serving path pools only the 4x4
    subgrid that the stride-2 convs would sample anyway (positions 0/2/4/6)
    and calls with ``first_stride=1`` — mathematically identical output for
    a third of the pooling work. Params are stride-independent, so one
    checkpoint serves both.
    """
    depth: int = 101
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, first_stride: int = 2):
        _, _, _, n4 = RESNET_STAGES[self.depth]
        x = x.astype(self.dtype)
        x = ResNetStage(512, n4, first_stride, self.dtype, name="layer4")(x)
        return jnp.mean(x, axis=(1, 2))


class VGG16Trunk(nn.Module):
    """VGG16 conv1_1..conv5_3 (stride 16, final pool dropped) — the
    ``vgg16.yml`` backbone variant. The conv4_3 output serves as the style
    tap (the analogue of the ResNet layer2 tap)."""
    dtype: jnp.dtype = jnp.bfloat16

    CFG: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512)

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        tap = None
        conv_i = 0
        pools = 0
        for v in self.CFG:
            if v == "M":
                if pools == 3:
                    tap = x
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                pools += 1
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        return x, tap


class VGG16Head(nn.Module):
    """fc6/fc7 head over flattened 7x7x512 pooled features -> (R, 4096)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return x
