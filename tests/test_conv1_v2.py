"""conv1 v2 kernel (strip-packed, transposed per-row dots): numerics.

The kernel is a documented NEGATIVE for perf (9.30 ms vs XLA direct
7.95 at b16 on the live chip — PERF.md round 4 "conv1 attribution");
it is kept because its attribution (construction floor, Mosaic stride
limits) closes the conv1 line with reasons, and its numerics pin the
strip/K-packing scheme against the reference conv semantics
[lib/model/faster_rcnn/resnet_instance_styleD_bilinear.py:366-369].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2vsgg_tpu.ops.pallas.conv1_v2_kernel import conv1_bn_relu_pallas_v2


@pytest.mark.parametrize("shape", [(2, 70, 130), (1, 64, 128)])
def test_conv1_v2_matches_xla_conv(shape):
    b, h, w_ = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w_, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jnp.maximum(ref.astype(jnp.float32) * scale + bias, 0.0)

    out = conv1_bn_relu_pallas_v2(x, w, scale, bias, interpret=True)
    assert out.shape == ref.shape
    # the kernel folds the FrozenBN scale into the bf16 weights (one
    # extra bf16 rounding of s*w vs s*(conv of bf16 w)) — same rounding
    # class as the bf16w serving lever
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.06)
