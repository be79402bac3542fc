"""conv1 Pallas kernel vs the XLA conv it replaces (interpret mode on CPU;
the real-TPU A/B lives in tools/microbench_conv1.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from i2vsgg_tpu.ops.pallas.conv1_kernel import (
    Conv1Planes, conv1_bn_relu_pallas, conv1_bn_relu_pallas_planes,
    pack_conv1_planes, pack_conv1_planes_np)


def _oracle(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y * scale + bias, 0.0)


@pytest.mark.parametrize("shape", [(1, 64, 96), (2, 50, 70)])
def test_conv1_kernel_matches_xla(shape):
    b, h, w_ = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w_, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    got = conv1_bn_relu_pallas(x, w, scale, bias, interpret=True)
    want = _oracle(x, w, scale, bias)
    assert got.shape == want.shape
    # bf16 compute in the kernel vs fp32 oracle
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.15)


@pytest.mark.parametrize("shape", [(1, 64, 96), (2, 50, 70)])
def test_host_pack_bit_identical_to_device_pack(shape):
    """The numpy loader-side packer and the jnp packer produce the SAME
    bytes — the host-plane serving contract rests on this."""
    b, h, w_ = shape
    rng = np.random.RandomState(3)
    x = (rng.randn(b, h, w_, 3) * 20).astype(np.float32)
    dev = np.asarray(pack_conv1_planes(jnp.asarray(x)), np.float32)
    host = np.asarray(pack_conv1_planes_np(x), np.float32)
    assert dev.shape == host.shape
    np.testing.assert_array_equal(dev, host)


def test_planes_entry_bit_identical_to_packed_entry():
    """conv1_bn_relu_pallas == pack (host, numpy) + planes entry."""
    rng = np.random.RandomState(4)
    x = (rng.randn(1, 64, 96, 3) * 20).astype(np.float32)
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    want = conv1_bn_relu_pallas(jnp.asarray(x), w, scale, bias,
                                interpret=True)
    planes = jnp.asarray(pack_conv1_planes_np(x))
    got = conv1_bn_relu_pallas_planes(planes, 64, 96, w, scale, bias,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got, np.float32))


def test_trunk_dispatches_on_conv1planes(monkeypatch):
    """ResNetTrunk fed a host-packed Conv1Planes matches the env-switched
    Pallas path bit-for-bit (same kernel, pre-built planes) and works
    under jit (pytree with static (h, w) aux)."""
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    rng = np.random.RandomState(5)
    xn = (rng.randn(1, 64, 80, 3) * 10).astype(np.float32)
    x = jnp.asarray(xn)
    trunk = ResNetTrunk(depth=10, dtype=jnp.float32)
    params = trunk.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    monkeypatch.setenv("I2VSGG_PALLAS_CONV1", "1")
    ref, ref_tap = trunk.apply({"params": params}, x)
    monkeypatch.delenv("I2VSGG_PALLAS_CONV1")
    planes = Conv1Planes.pack(xn)
    assert planes.shape == (1, 64, 80, 3)
    got, got_tap = jax.jit(
        lambda p, pl_: trunk.apply({"params": p}, pl_))(params, planes)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(got, np.float32))
    np.testing.assert_array_equal(np.asarray(ref_tap, np.float32),
                                  np.asarray(got_tap, np.float32))


def test_trunk_env_switch_matches(monkeypatch):
    """I2VSGG_PALLAS_CONV1=1 routes the trunk's conv1 through the kernel
    with identical parameters and near-identical output."""
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 80, 3).astype(np.float32) * 10)
    trunk = ResNetTrunk(depth=10, dtype=jnp.float32)
    params = trunk.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    ref, _ = trunk.apply({"params": params}, x)
    monkeypatch.setenv("I2VSGG_PALLAS_CONV1", "1")
    got, _ = trunk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.3)


@pytest.mark.parametrize("shape", [(1, 64, 96), (2, 50, 70), (1, 47, 131)])
def test_fused_stem_bitwise_equals_kernel_plus_maxpool(shape):
    """conv1_stem_pallas (channels-major pool before the NHWC fix-up) is
    BITWISE equal to conv1_bn_relu_pallas + the caffe ceil-mode maxpool:
    post-relu values are >= 0, so pooling across the kernel's zeroed
    padding equals the -inf ceil pad."""
    import flax.linen as fnn
    from i2vsgg_tpu.ops.pallas.conv1_kernel import conv1_stem_pallas
    b, h, w_ = shape
    rng = np.random.RandomState(6)
    x = jnp.asarray((rng.randn(b, h, w_, 3) * 20).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    y = conv1_bn_relu_pallas(x, w, scale, bias, interpret=True)
    pe = [(0, 1 if d % 2 == 0 else 0) for d in y.shape[1:3]]
    want = fnn.max_pool(y, (3, 3), strides=(2, 2), padding=pe)
    got = conv1_stem_pallas(x, w, scale, bias, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got, np.float32))
