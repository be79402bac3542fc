"""Checkpoint round-trip + the three reference restoration filters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.train.checkpoint import (restore_detector_init, restore_full,
                                         restore_intersection,
                                         restore_sgg_init, save_checkpoint,
                                         latest_step, load_metadata)
from i2vsgg_tpu.train.det_da import TrainState, create_train_state
from i2vsgg_tpu.train.optim import sgd_reference


def tiny_params(seed, n_cls=4):
    r = np.random.RandomState(seed)
    return {
        "trunk": {"conv1": {"kernel": jnp.asarray(r.randn(3, 3, 3, 8),
                                                  jnp.float32)}},
        "rpn": {"conv": {"kernel": jnp.asarray(r.randn(1, 1, 8, 8),
                                               jnp.float32)}},
        "cls_score": {"kernel": jnp.asarray(r.randn(8, n_cls), jnp.float32)},
        "bbox_pred": {"kernel": jnp.asarray(r.randn(8, 4 * n_cls),
                                            jnp.float32)},
        "netD_pixel": {"conv0": {"kernel": jnp.asarray(r.randn(1, 1, 8, 4),
                                                       jnp.float32)}},
        "netD_style": {"fc": {"kernel": jnp.asarray(r.randn(8, 1),
                                                    jnp.float32)}},
    }


@pytest.fixture
def ckpt(tmp_path):
    tx = sgd_reference(1e-3, Config())
    params = tiny_params(0)
    state = create_train_state(params, tx)
    state = TrainState(state.params, state.opt_state,
                       jnp.asarray(7, jnp.int32))
    path = save_checkpoint(str(tmp_path), state, step=7,
                           metadata={"session": 1, "epoch": 3,
                                     "pooling_mode": "align"})
    return tmp_path, state, tx


def test_full_resume_roundtrip(ckpt):
    tmp_path, state, tx = ckpt
    assert latest_step(str(tmp_path)) == 7
    fresh = create_train_state(tiny_params(99), tx)
    restored = restore_full(str(tmp_path), 7, fresh)
    np.testing.assert_array_equal(
        np.asarray(restored.params["cls_score"]["kernel"]),
        np.asarray(state.params["cls_score"]["kernel"]))
    assert int(restored.step) == 7
    assert load_metadata(str(tmp_path), 7)["pooling_mode"] == "align"


def test_detector_init_skips_heads(ckpt):
    tmp_path, state, _ = ckpt
    init = tiny_params(42)
    out = restore_detector_init(str(tmp_path), 7, init)
    # trunk copied from checkpoint
    np.testing.assert_array_equal(
        np.asarray(out["trunk"]["conv1"]["kernel"]),
        np.asarray(state.params["trunk"]["conv1"]["kernel"]))
    # heads + discriminators keep their fresh init
    for root in ("cls_score", "bbox_pred", "netD_pixel", "netD_style", "rpn"):
        fresh_leaf = jax.tree.leaves(init[root])[0]
        out_leaf = jax.tree.leaves(out[root])[0]
        np.testing.assert_array_equal(np.asarray(out_leaf),
                                      np.asarray(fresh_leaf))


def test_detector_init_shape_intersection(ckpt):
    """New class count -> head shapes differ; trunk still loads (the
    reference's intersection load semantics)."""
    tmp_path, state, _ = ckpt
    init = tiny_params(42, n_cls=9)
    out = restore_intersection(str(tmp_path), 7, init)
    np.testing.assert_array_equal(
        np.asarray(out["trunk"]["conv1"]["kernel"]),
        np.asarray(state.params["trunk"]["conv1"]["kernel"]))
    # mismatched-shape head kept fresh
    np.testing.assert_array_equal(np.asarray(out["cls_score"]["kernel"]),
                                  np.asarray(init["cls_score"]["kernel"]))


def test_sgg_init_copies_trunk_only(ckpt):
    tmp_path, state, _ = ckpt
    sgg_init = {
        "trunk": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 8), jnp.float32)}},
        "vrd": {"fc6": {"kernel": jnp.ones((8, 4), jnp.float32)}},
    }
    out = restore_sgg_init(str(tmp_path), 7, sgg_init)
    np.testing.assert_array_equal(
        np.asarray(out["trunk"]["conv1"]["kernel"]),
        np.asarray(state.params["trunk"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(out["vrd"]["fc6"]["kernel"]),
                                  np.ones((8, 4), np.float32))
