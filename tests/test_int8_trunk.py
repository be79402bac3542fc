"""int8 trunk-conv serving path (I2VSGG_INT8_TRUNK, BNConv —
models/backbones.py): per-output-channel symmetric weight quantization +
per-tensor dynamic activation quantization with an int32 accumulate.
Quality is gated separately on a trained checkpoint
(tools/quant_trunk_ab.py); these tests pin the mechanism — the param
tree is unchanged, the quantized conv tracks the fp conv within the
8-bit error budget, and the env gate is trace-time and stale-proof."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2vsgg_tpu.models.backbones import BNConv, ResNetTrunk


@pytest.fixture
def int8_env():
    os.environ["I2VSGG_INT8_TRUNK"] = "1"
    yield
    os.environ.pop("I2VSGG_INT8_TRUNK", None)


def _bnconv(k, stride, x):
    m = BNConv(32, x.shape[-1], k, stride, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    return m, params


def test_int8_conv_tracks_fp_within_quant_budget(int8_env):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 20, 24).astype(np.float32))
    for k, stride in ((1, 1), (3, 1), (1, 2), (3, 2)):
        m, params = _bnconv(k, stride, x)
        y_q = m.apply(params, x)
        os.environ.pop("I2VSGG_INT8_TRUNK", None)
        try:
            y_fp = m.apply(params, x)
        finally:
            os.environ["I2VSGG_INT8_TRUNK"] = "1"
        assert y_q.shape == y_fp.shape
        # two symmetric 8-bit quantizations (weights per-channel,
        # activations per-tensor) -> relative output error well under 2%
        # for gaussian data
        err = (jnp.linalg.norm(y_q - y_fp)
               / jnp.maximum(jnp.linalg.norm(y_fp), 1e-8))
        assert float(err) < 0.02, (k, stride, float(err))


def test_int8_param_tree_is_unchanged(int8_env):
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    m = BNConv(16, 8, 3, 1, dtype=jnp.float32)
    p_q = m.init(jax.random.PRNGKey(0), x)
    os.environ.pop("I2VSGG_INT8_TRUNK", None)
    try:
        p_fp = m.init(jax.random.PRNGKey(0), x)
    finally:
        os.environ["I2VSGG_INT8_TRUNK"] = "1"
    assert jax.tree_util.tree_structure(p_q) == \
        jax.tree_util.tree_structure(p_fp)
    for a, b in zip(jax.tree_util.tree_leaves(p_q),
                    jax.tree_util.tree_leaves(p_fp)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_trunk_forward_finite_and_close(int8_env):
    """Full trunk forward: int8 bottleneck convs stay within a few
    percent of the fp trunk end to end (errors compound across ~30
    convs but the residual stream keeps them bounded)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 20)
    trunk = ResNetTrunk(depth=50, dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)
    y_q, tap_q = trunk.apply(params, x)
    os.environ.pop("I2VSGG_INT8_TRUNK", None)
    try:
        y_fp, tap_fp = trunk.apply(params, x)
    finally:
        os.environ["I2VSGG_INT8_TRUNK"] = "1"
    assert bool(jnp.all(jnp.isfinite(y_q)))
    for q, fp in ((y_q, y_fp), (tap_q, tap_fp)):
        err = (jnp.linalg.norm(q - fp)
               / jnp.maximum(jnp.linalg.norm(fp), 1e-8))
        assert float(err) < 0.10, float(err)


def test_env_gate_off_is_exact_fp_path():
    """Without the env var the fp path must be bit-identical to before
    (the int8 branch must not perturb the default serving program)."""
    os.environ.pop("I2VSGG_INT8_TRUNK", None)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 12, 8).astype(np.float32))
    m = BNConv(16, 8, 3, 1, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    ref = jax.lax.conv_general_dilated(
        x, params["params"]["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_sim_mode_matches_real_int8_path():
    """'sim' (fake-quant fp32 conv — what the CPU quality gate runs) must
    equal the real int8/int32 path up to fp32 accumulator rounding: the
    integer taps are identical, only the accumulator differs (int32 is
    exact; fp32 is exact below 2^24, and a 3x3x24 conv's running sums of
    |q|<=127 products stay far below that)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 20, 24).astype(np.float32))
    m = BNConv(32, 24, 3, 1, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    os.environ["I2VSGG_INT8_TRUNK"] = "1"
    try:
        y_mxu = m.apply(params, x)
        os.environ["I2VSGG_INT8_TRUNK"] = "sim"
        y_sim = m.apply(params, x)
    finally:
        os.environ.pop("I2VSGG_INT8_TRUNK", None)
    np.testing.assert_allclose(np.asarray(y_sim), np.asarray(y_mxu),
                               rtol=1e-6, atol=1e-6)


def test_layer_scoped_mode_quantizes_only_matching_paths():
    """'<kind>:tok1,tok2' quantizes only convs whose module path contains
    a token (partial-depth int8 — the full-trunk A/B failed its round-4
    quality gate, so depth-restricted variants are the re-gate
    candidates). Non-matching scope must be the EXACT fp program; a scope
    covering every trunk stage must reproduce the unscoped mode."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 20)
    trunk = ResNetTrunk(depth=50, dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)

    def run(mode):
        if mode:
            os.environ["I2VSGG_INT8_TRUNK"] = mode
        else:
            os.environ.pop("I2VSGG_INT8_TRUNK", None)
        try:
            return trunk.apply(params, x)
        finally:
            os.environ.pop("I2VSGG_INT8_TRUNK", None)

    y_fp, tap_fp = run("")
    y_none, tap_none = run("sim:layer9")       # no trunk path matches
    np.testing.assert_array_equal(np.asarray(y_none), np.asarray(y_fp))
    np.testing.assert_array_equal(np.asarray(tap_none), np.asarray(tap_fp))

    y_l2, tap_l2 = run("sim:layer2")           # scope: layer2 only
    # the layer2 tap is quantized, and the change propagates to layer3
    assert float(jnp.linalg.norm(tap_l2 - tap_fp)) > 0
    assert float(jnp.linalg.norm(y_l2 - y_fp)) > 0

    y_l1, tap_l1 = run("sim:layer1")           # scope: layer1 only
    # layer1 precedes the tap, so both outputs move — but differently
    # from the layer2 scope (the scopes really select different convs)
    assert float(jnp.linalg.norm(tap_l1 - tap_l2)) > 0

    y_all, tap_all = run("sim:layer1,layer2,layer3")
    y_sim, tap_sim = run("sim")                # unscoped = every BNConv
    np.testing.assert_array_equal(np.asarray(y_all), np.asarray(y_sim))
    np.testing.assert_array_equal(np.asarray(tap_all), np.asarray(tap_sim))


def test_prequantized_tree_matches_env_path_bitwise():
    """quantize_trunk_params hoists the per-step weight-quant chain to
    load time; the transformed tree must produce BIT-IDENTICAL outputs to
    the on-the-fly env path (same integer taps, same rescale), so the
    committed quality gates (runs/quant_trunk_ab/*.json) carry over."""
    from i2vsgg_tpu.utils.params import quantize_trunk_params
    rng = np.random.RandomState(5)
    # input large enough that layer3's fmap exceeds BNConv's small-grid
    # threshold (h*w > 64) — in production (38x60) the env path quantizes
    # layer3's 1x1 convs too, and the transform must match THAT behavior
    x = jnp.asarray(rng.randn(1, 144, 192, 3).astype(np.float32) * 20)
    trunk = ResNetTrunk(depth=10, dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)

    os.environ["I2VSGG_INT8_TRUNK"] = "1:layer3"
    try:
        y_env, tap_env = trunk.apply(params, x)
    finally:
        os.environ.pop("I2VSGG_INT8_TRUNK", None)

    q = {"params": quantize_trunk_params(params["params"], "layer3")}
    # scoped kernels became int8 + scale; out-of-scope stayed put
    l3k = q["params"]["layer3"]["block0"]["conv2"]
    assert l3k["kernel"].dtype == jnp.int8
    assert l3k["kernel_scale"].shape == (256,)
    assert q["params"]["layer2"]["block0"]["conv2"]["kernel"].dtype \
        == jnp.float32
    y_q, tap_q = trunk.apply(q, x)          # env var NOT set
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_env))
    np.testing.assert_array_equal(np.asarray(tap_q), np.asarray(tap_env))


def test_prequantized_layer4_small_grid_1x1s_stay_bf16():
    """The transform must skip 1x1 kernels under layer4 (they run on the
    per-roi small-grid matmul path, which stays bf16 by design) while
    quantizing layer4's 3x3 convs."""
    from i2vsgg_tpu.utils.params import quantize_trunk_params
    from i2vsgg_tpu.models.backbones import ResNetHead
    head = ResNetHead(depth=50, dtype=jnp.float32)
    x = jnp.zeros((2, 4, 4, 1024), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x, first_stride=1)
    q = quantize_trunk_params(params["params"], "layer3,layer4")
    b0 = q["layer4"]["block0"]
    assert b0["conv1"]["kernel"].dtype == jnp.float32      # 1x1 skipped
    assert "kernel_scale" not in b0["conv1"]
    assert b0["conv2"]["kernel"].dtype == jnp.int8          # 3x3 quantized


def test_k3_filter_token_selects_only_3x3_convs():
    """'@3x3' scope token restricts quantization to 3x3 kernels (the
    live-chip microbench — tools/int8_conv_micro.py — measured XLA's
    int8 1x1 convs SLOWER than bf16 at fmap scale, so the profitable
    scope is kernel-size-filtered). Env path and pre-quantized tree must
    agree bitwise and must leave every 1x1 kernel fp."""
    from i2vsgg_tpu.utils.params import quantize_trunk_params
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 144, 192, 3).astype(np.float32) * 20)
    trunk = ResNetTrunk(depth=10, dtype=jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)

    q = {"params": quantize_trunk_params(params["params"],
                                         "layer3,@3x3")}
    b0 = q["params"]["layer3"]["block0"]
    assert b0["conv2"]["kernel"].dtype == jnp.int8          # 3x3 in scope
    assert b0["conv1"]["kernel"].dtype == jnp.float32       # 1x1 skipped
    assert b0["conv3"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in b0["conv1"]

    os.environ["I2VSGG_INT8_TRUNK"] = "1:layer3,@3x3"
    try:
        y_env, tap_env = trunk.apply(params, x)
    finally:
        os.environ.pop("I2VSGG_INT8_TRUNK", None)
    y_q, tap_q = trunk.apply(q, x)          # env var NOT set
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_env))
    np.testing.assert_array_equal(np.asarray(tap_q), np.asarray(tap_env))

    # the k3-scoped program really differs from fp AND from the full
    # layer3 scope (it selects a strict subset of layer3's convs)
    y_fp, _ = trunk.apply(params, x)
    assert float(jnp.linalg.norm(y_env - y_fp)) > 0
    os.environ["I2VSGG_INT8_TRUNK"] = "1:layer3"
    try:
        y_l3, _ = trunk.apply(params, x)
    finally:
        os.environ.pop("I2VSGG_INT8_TRUNK", None)
    assert float(jnp.linalg.norm(y_env - y_l3)) > 0
