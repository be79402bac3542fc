"""int8 conv1 Pallas kernel vs a fake-quant fp32 oracle (interpret mode).

The kernel's ONLY approximations are (a) per-out-channel int8 weight
quantization and (b) <=0.5-intensity padding residue on border taps —
activations are exact for integer pixels (raw-128 offset scheme). The
oracle applies the SAME weight quantization in fp32, so interior outputs
must match to bf16 output rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from i2vsgg_tpu.ops.pallas.conv1_int8_kernel import (
    conv1_bn_relu_int8_pallas, DEFAULT_PIXEL_MEANS)


def _fakequant_oracle(x, w, scale, bias):
    wf = np.asarray(w, np.float32).transpose(3, 0, 1, 2).reshape(64, 147)
    w_s = np.maximum(np.abs(wf).max(axis=1), 1e-8) / 127.0
    w_q = np.round(wf / w_s[:, None]) * w_s[:, None]
    wq = jnp.asarray(w_q.reshape(64, 7, 7, 3).transpose(1, 2, 3, 0))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), wq,
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y * scale + bias, 0.0)


@pytest.mark.parametrize("shape", [(1, 64, 96), (2, 50, 70)])
def test_conv1_int8_matches_fakequant_oracle(shape):
    b, h, w_ = shape
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (b, h, w_, 3)).astype(np.float32)
    x = jnp.asarray(raw - np.asarray(DEFAULT_PIXEL_MEANS, np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    got = conv1_bn_relu_int8_pallas(x, w, scale, bias, interpret=True)
    want = _fakequant_oracle(x, w, scale, bias)
    assert got.shape == want.shape
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    # interior: integer-exact dot, only bf16 OUTPUT rounding (the scale
    # magnitudes here put outputs in the hundreds -> atol ~2)
    sc = np.abs(want).max()
    np.testing.assert_allclose(got[:, 2:-2, 2:-2], want[:, 2:-2, 2:-2],
                               atol=0.01 * sc)
    # borders additionally carry the <=0.5-intensity pad residue
    np.testing.assert_allclose(got, want, atol=0.02 * sc)


def test_conv1_int8_weight_quant_error_bounded():
    """End-to-end vs the UNQUANTIZED fp32 conv: the weight-quant error on
    realistic-scale kernels stays under ~1.5% of output scale."""
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 256, (1, 64, 96, 3)).astype(np.float32)
    x = jnp.asarray(raw - np.asarray(DEFAULT_PIXEL_MEANS, np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    scale = jnp.ones(64, jnp.float32)
    bias = jnp.zeros(64, jnp.float32)
    got = np.asarray(conv1_bn_relu_int8_pallas(
        x, w, scale, bias, interpret=True), np.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = np.asarray(jnp.maximum(y, 0.0), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 0.015, err
