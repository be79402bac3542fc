"""NetDStyle's Gram-matrix formulation vs the direct factorized-bilinear
sum [resnet_instance_styleD_bilinear.py:120-146] — must be exact up to
association order."""

import jax
import jax.numpy as jnp
import numpy as np

from i2vsgg_tpu.models.discriminators import NetDStyle


def _direct(params, x, dim=512, rank=5):
    """The reference's per-position formulation, fp32."""
    b = x.shape[0]
    xf = x.reshape(b, -1, x.shape[-1]).astype(np.float64)
    w1 = np.asarray(params["fc_1"]["kernel"], np.float64)
    c1 = np.asarray(params["fc_1"]["bias"], np.float64)
    w2 = np.asarray(params["fc_2"]["kernel"], np.float64)
    c2 = np.asarray(params["fc_2"]["bias"], np.float64)
    x1 = xf @ w1 + c1
    x2 = xf @ w2 + c2
    z = (x1 * x2).reshape(b, -1, dim, rank).sum(-1).sum(1)
    z = np.sqrt(np.maximum(z, 0)) - np.sqrt(np.maximum(-z, 0))
    z = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    w = np.asarray(params["fc1"]["kernel"], np.float64)
    bb = np.asarray(params["fc1"]["bias"], np.float64)
    return 1.0 / (1.0 + np.exp(-(z @ w + bb)))


def test_gram_formulation_matches_direct():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 6, 512).astype(np.float32))
    mod = NetDStyle(context=True, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out, feat = mod.apply({"params": params}, x, 1.0)
    want = _direct(params, np.asarray(x))
    np.testing.assert_allclose(np.asarray(out, np.float64), want,
                               rtol=1e-4, atol=1e-5)


def test_gram_formulation_bf16_production_dtype():
    """The DA training path instantiates NetDStyle with the model compute
    dtype (bf16). The Gram accumulation + contraction stay fp32, so bf16
    rounding enters only via the per-position inputs — outputs must track
    the fp64 oracle to bf16-input tolerance."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 5, 6, 512).astype(np.float32))
    mod = NetDStyle(context=True, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out, feat = mod.apply({"params": params}, x, 1.0)
    want = _direct(params, np.asarray(x))
    # sigmoid output in [0,1]: atol dominated by bf16 input rounding (~3e-3
    # relative on x, quadratic form doubles it)
    np.testing.assert_allclose(np.asarray(out, np.float64), want,
                               rtol=0.05, atol=0.02)
    assert np.isfinite(np.asarray(feat, np.float64)).all()


def test_grl_gradient_still_reversed():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 512).astype(np.float32))
    mod = NetDStyle(dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    def loss(x, lamb):
        return jnp.sum(mod.apply({"params": params}, x, lamb) ** 2)

    g_pos = jax.grad(loss)(x, 1.0)
    g_neg = jax.grad(loss)(x, -1.0)
    # GRL: grad wrt x scales with -lambda
    np.testing.assert_allclose(np.asarray(g_pos), -np.asarray(g_neg),
                               rtol=1e-4, atol=1e-6)
    assert float(jnp.abs(g_pos).sum()) > 0
