"""Domain discriminators + gradient reversal for adversarial adaptation.

TPU-native rebuild of the reference's two discriminators
(``lib/model/faster_rcnn/resnet_instance_styleD_bilinear.py:38-146``) and the
GRL autograd Function (``lib/model/utils/net_utils.py:52-61``):

* ``grad_reverse`` — identity forward, ``-lambda * g`` backward, as a
  ``jax.custom_vjp`` (the JAX-idiomatic GRL).
* ``NetDPixel`` — instance-level patch discriminator: three 1x1 convs
  (1024->512->128->1, no bias) + sigmoid over 7x7 ROI feature patches;
  optional global-average context feature (``ic``).
* ``NetDStyle`` — factorized bilinear-pooling style discriminator over the
  layer2 (512-ch) feature map: two rank-5 projections, hadamard product,
  rank+spatial sum, signed-sqrt, L2 norm, linear->sigmoid. The spatial sum
  is einsum-shaped so XLA maps it onto the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@jax.custom_vjp
def grad_reverse(x, lamb):
    return x


def _gr_fwd(x, lamb):
    return x, lamb


def _gr_bwd(lamb, g):
    return (-lamb * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class NetDPixel(nn.Module):
    """Patch discriminator on pooled ROI features (R, 7, 7, 1024).
    [resnet_instance_styleD_bilinear.py:38-83]

    Returns per-pixel probabilities (R, 7, 7, 1); with ``context`` also the
    128-d global-average feature tapped after conv2.

    ``preconv``/``context_tail`` split the forward at conv1 for the fused
    serving path: conv1 is a no-bias 1x1 (linear), so it commutes EXACTLY
    with RoIAlign — serving applies it once to the feature map instead of
    per pooled roi, then pools 512 channels instead of 1024.
    """
    context: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from i2vsgg_tpu.models.inits import normal_init
        # reference init: normal(0, 0.01) on all three convs
        # [resnet_instance_styleD_bilinear.py:52-64]; param names come from
        # the attribute names (conv1/conv2/conv3, unchanged)
        conv = lambda f: nn.Conv(f, (1, 1), use_bias=False,
                                 kernel_init=normal_init(0.01),
                                 dtype=self.dtype)
        self.conv1 = conv(512)
        self.conv2 = conv(128)
        self.conv3 = conv(1)

    def __call__(self, x, lamb=1.0):
        x = grad_reverse(x.astype(self.dtype), jnp.asarray(lamb, self.dtype))
        x = nn.relu(self.conv1(x))
        x = nn.relu(self.conv2(x))
        # probabilities in fp32: the LSGAN losses reduce over many elements
        out = jax.nn.sigmoid(self.conv3(x).astype(jnp.float32))
        if self.context:
            feat = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (R, 128)
            return out, feat
        return out

    def preconv(self, fmap):
        """conv1 applied to the raw (B, H, W, 1024) feature map."""
        return self.conv1(fmap.astype(self.dtype))

    def context_tail(self, x512):
        """(R, P, P, 512) pre-conv1 pooled features -> (R, 128) context
        feature (the ic concat input; the d-probability head is not needed
        at inference)."""
        x = nn.relu(x512.astype(self.dtype))
        x = nn.relu(self.conv2(x))
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


class RawDense(nn.Module):
    """Dense layer whose (kernel, bias) are directly queryable (call with
    no argument). Param names/shapes match ``nn.Dense`` exactly."""
    features: int
    in_features: int
    kernel_init: object
    bias_init: object
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x=None):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        if x is None:
            return k, b
        return x @ k.astype(self.dtype) + b.astype(self.dtype)


class NetDStyle(nn.Module):
    """Factorized bilinear style discriminator on (B, H, W, 512) features.
    [resnet_instance_styleD_bilinear.py:85-146]

    The reference computes (fc_1 x) * (fc_2 x) per position and sums over
    rank AND spatial dims BEFORE the signed-sqrt (`:129-137`) — so the
    pooled pre-activation is a quadratic form in the 512x512 spatial Gram
    matrix G = sum_p x_p x_p^T:

        z[d] = sum_k w1_dk^T G w2_dk  +  c2.(W1^T s) + c1.(W2^T s)
               + P * c1.c2,            s = sum_p x_p,  P = HW

    Computing G first costs ~8x fewer FLOPs than materializing the two
    (HW, dim*rank) projections (48 vs 377 GFLOP at 8x600x960) and is
    EXACT — same math, different association order.
    """
    context: bool = False
    dim: int = 512
    rank: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lamb=1.0):
        from i2vsgg_tpu.models.inits import kaiming_fan_out, torch_linear_bias
        f32 = jnp.float32
        b = x.shape[0]
        cin = x.shape[-1]
        x = grad_reverse(x.astype(self.dtype), jnp.asarray(lamb, self.dtype))
        x = x.reshape(b, -1, cin)                            # (B, HW, 512)
        p = x.shape[1]
        # reference init: kaiming_normal fan_out on the weights, torch
        # Linear default on the biases [resnet_…:104-118]; param tree is
        # identical to the previous nn.Dense formulation
        w1, c1 = RawDense(self.dim * self.rank, cin, kaiming_fan_out(),
                          torch_linear_bias(cin), name="fc_1")()
        w2, c2 = RawDense(self.dim * self.rank, cin, kaiming_fan_out(),
                          torch_linear_bias(cin), name="fc_2")()
        g = jnp.einsum("bpc,bpd->bcd", x, x,
                       preferred_element_type=f32)           # (B, 512, 512)
        s = jnp.sum(x.astype(f32), axis=1)                   # (B, 512)
        # G entries are sums over ~HW=2.3k positions — keep the fp32
        # accumulation through the contraction (a bf16 downcast here has a
        # different rounding profile than the per-position reference
        # formulation; the einsum is only ~0.7 GFLOP/image post-Gram, so
        # fp32 costs nothing measurable)
        m = jnp.einsum("bcd,di->bci", g, w2.astype(f32),
                       preferred_element_type=f32)           # (B, 512, DR)
        t = jnp.einsum("bci,ci->bi", m, w1.astype(f32))      # (B, DR)
        u1 = s @ w1.astype(f32)
        u2 = s @ w2.astype(f32)
        c1 = c1.astype(f32)
        c2 = c2.astype(f32)
        z = t + c2 * u1 + c1 * u2 + float(p) * c1 * c2
        z = z.reshape(b, self.dim, self.rank).sum(-1)        # (B, dim)
        z = jnp.sqrt(nn.relu(z)) - jnp.sqrt(nn.relu(-z))     # signed sqrt
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
        out = jax.nn.sigmoid(nn.Dense(
            1, kernel_init=kaiming_fan_out(),
            bias_init=torch_linear_bias(self.dim), name="fc1")(z))
        if self.context:
            return out, z
        return out


def lsgan_source_loss(d_out: jnp.ndarray, valid=None) -> jnp.ndarray:
    """0.5 * mean(D^2) — source pushed toward 0.
    [trainval_net_instance_styleD_bilinear.py:284-285]"""
    if valid is None:
        return 0.5 * jnp.mean(d_out ** 2)
    w = valid.astype(d_out.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0) * (d_out.size / d_out.shape[0])
    return 0.5 * jnp.sum((d_out ** 2) * w.reshape((-1,) + (1,) * (d_out.ndim - 1))) / denom


def lsgan_target_loss(d_out: jnp.ndarray, valid=None) -> jnp.ndarray:
    """0.5 * mean((1-D)^2) — target pushed toward 1. [trainval...:293-295]"""
    if valid is None:
        return 0.5 * jnp.mean((1.0 - d_out) ** 2)
    w = valid.astype(d_out.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0) * (d_out.size / d_out.shape[0])
    return 0.5 * jnp.sum(((1.0 - d_out) ** 2) * w.reshape((-1,) + (1,) * (d_out.ndim - 1))) / denom
