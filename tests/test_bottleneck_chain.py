"""Fused identity-bottleneck-chain Pallas kernel vs the XLA block path.

The kernel must be bit-comparable (bf16 rounding aside) to running the
same blocks through the stock Bottleneck modules — same folded FrozenBN
affines, same zero-pad 3x3 semantics, same residual/relu order
[resnet_instance_styleD_bilinear.py:148-246].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2vsgg_tpu.models.backbones import ResNetStage
from i2vsgg_tpu.ops.pallas.bottleneck_kernel import (bottleneck_chain_pallas,
                                                     chain_geometry)


def _random_params(rng, n, c, m):
    def r(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    w1 = jnp.stack([r(c, m) for _ in range(n)])
    b1 = jnp.stack([r(m) for _ in range(n)])
    w3 = jnp.stack([r(9, m, m) for _ in range(n)])
    b3 = jnp.stack([r(m) for _ in range(n)])
    w2 = jnp.stack([r(m, c) for _ in range(n)])
    b2 = jnp.stack([r(c) for _ in range(n)])
    return w1, b1, w3, b3, w2, b2


def _reference_chain(x, w1, b1, w3, b3, w2, b2):
    """Plain-jnp oracle: n blocks of 1x1 -> relu -> 3x3(zero pad) -> relu
    -> 1x1 -> +residual -> relu, bf16 compute like the kernel."""
    n, c, m = w1.shape
    x = x.astype(jnp.bfloat16)
    for i in range(n):
        a = jnp.maximum(
            (x @ w1[i].astype(jnp.bfloat16)).astype(jnp.float32) + b1[i], 0.0)
        a = a.astype(jnp.bfloat16)
        k = w3[i].reshape(3, 3, m, m).astype(jnp.bfloat16)
        cmid = jax.lax.conv_general_dilated(
            a, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        bmid = jnp.maximum(cmid + b3[i], 0.0).astype(jnp.bfloat16)
        y = (bmid @ w2[i].astype(jnp.bfloat16)).astype(jnp.float32) + b2[i]
        x = jnp.maximum(x.astype(jnp.float32) + y, 0.0).astype(jnp.bfloat16)
    return x


@pytest.mark.parametrize("b,h,w,c,m,n", [
    (1, 15, 20, 256, 128, 2),     # 240-scale layer3-ish (res50 tests)
    (2, 9, 13, 128, 128, 3),      # odd sizes exercise partial bands
])
def test_chain_matches_oracle(b, h, w, c, m, n):
    rng = np.random.RandomState(0)
    params = _random_params(rng, n, c, m)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    want = _reference_chain(x, *params)
    got = bottleneck_chain_pallas(x, *params, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)
    # exact agreement on the overwhelming majority of cells (both paths
    # are bf16; only accumulation order differs)
    close = np.mean(np.isclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.02))
    assert close > 0.999, close


def test_stage_fused_equals_unfused(monkeypatch):
    """ResNetStage with the env gate on (interpret mode off-TPU) matches
    the stock block loop on the same params."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 12, 256).astype(np.float32))
    stage = ResNetStage(planes=128, blocks=3, stride=1, dtype=jnp.bfloat16)
    params = stage.init(jax.random.PRNGKey(0), x)["params"]
    # make FrozenBN affines non-trivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * np.float32(rng.randn()), params)
    monkeypatch.delenv("I2VSGG_PALLAS_BOTTLENECK", raising=False)
    unfused = np.asarray(stage.apply({"params": params}, x), np.float32)
    monkeypatch.setenv("I2VSGG_PALLAS_BOTTLENECK", "1")
    fused = np.asarray(stage.apply({"params": params}, x), np.float32)
    # calibrate against fp32 truth: the kernel folds BN in fp32 and
    # accumulates in fp32, so it lands CLOSER to fp32 than the bf16 XLA
    # path — require it no worse than the stock path's bf16 error, and
    # the two bf16 paths to agree to bf16 noise
    stage32 = ResNetStage(planes=128, blocks=3, stride=1,
                          dtype=jnp.float32)
    truth = np.asarray(stage32.apply({"params": params}, x), np.float32)
    err_fused = np.abs(fused - truth).mean()
    err_unfused = np.abs(unfused - truth).mean()
    assert err_fused <= 1.5 * err_unfused, (err_fused, err_unfused)
    rel = np.abs(fused - unfused) / np.maximum(np.abs(truth), 1.0)
    assert np.percentile(rel, 99) < 0.1, np.percentile(rel, 99)


def test_geometry_alignment():
    for w in (20, 60, 61, 120):
        hp, ww, wq = chain_geometry(38, w)
        assert ww % 16 == 0 and wq % 16 == 0 and ww >= w + 1
        assert wq >= ww + 2
