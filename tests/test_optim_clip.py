"""Gradient-clip norm scope must match the reference's clip_gradient
(net_utils.py:88-99): the global norm is computed over TRAINABLE params
only — frozen layers (conv1/bn1) carry no grad in torch and must not
inflate the norm (an inflated norm makes every clipped step smaller than
the reference's: a systematic training asymmetry)."""

import jax
import jax.numpy as jnp
import numpy as np

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.train.optim import sgd_reference


def _params():
    return {
        "trunk": {"conv1": {"kernel": jnp.ones((2, 2))},
                  "layer1": {"conv": {"kernel": jnp.ones((2, 2))}}},
        "head": {"kernel": jnp.ones((3,)), "bias": jnp.zeros((3,))},
    }


def _grads(frozen_scale):
    return {
        "trunk": {"conv1": {"kernel": jnp.full((2, 2), frozen_scale)},
                  "layer1": {"conv": {"kernel": jnp.full((2, 2), 3.0)}}},
        "head": {"kernel": jnp.full((3,), 4.0), "bias": jnp.full((3,), 1.0)},
    }


def test_frozen_grads_do_not_affect_clip_scale():
    cfg = Config()
    p = _params()
    tx = sgd_reference(1e-2, cfg, clip_norm=1.0)
    s1 = tx.init(p)
    s2 = tx.init(p)
    # same trainable grads; wildly different frozen (conv1) grads
    u_small, _ = tx.update(_grads(0.0), s1, p)
    u_big, _ = tx.update(_grads(1e6), s2, p)
    for a, b in zip(jax.tree_util.tree_leaves(u_small),
                    jax.tree_util.tree_leaves(u_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_clip_matches_torch_semantics():
    """scale = clip / max(norm_trainable, clip), applied before momentum."""
    cfg = Config()
    p = _params()
    clip = 1.0
    tx = sgd_reference(1.0, cfg, clip_norm=clip)
    state = tx.init(p)
    g = _grads(123.0)
    updates, _ = tx.update(g, state, p)
    # trainable-norm = sqrt(4*9 + 3*16 + 3*1) = sqrt(87)
    norm = float(np.sqrt(4 * 9 + 3 * 16 + 3 * 1))
    scale = clip / norm
    # head kernel: weight group (wd applies to PARAMS after clip-scale of
    # grads: update = -(lr) * (g*scale + wd*p)); check against formula
    wd = cfg.TRAIN.WEIGHT_DECAY
    want = -(4.0 * scale + wd * 1.0)
    np.testing.assert_allclose(np.asarray(updates["head"]["kernel"]),
                               np.full((3,), want), rtol=1e-5)
    # frozen conv1 receives zero update
    assert float(jnp.abs(updates["trunk"]["conv1"]["kernel"]).sum()) == 0.0
