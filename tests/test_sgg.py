"""SGG (Stage B) tests: head forward, pair batching, train step, and the
frozen-trunk guarantee."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2vsgg_tpu.models.backbones import ResNetTrunk
from i2vsgg_tpu.models.sgg import SGGModel, VRDHead, bce_multilabel_loss
from i2vsgg_tpu.config import Config
from i2vsgg_tpu.train.det_da import create_train_state
from i2vsgg_tpu.train.sgg import (build_pair_batch, make_sgg_train_step,
                                  sgg_optimizer, sgg_loss)

N_REL = 7
G = 5            # padded gt boxes per image
P = 8            # padded pairs per image
B, H, W = 2, 64, 80


def make_model():
    return SGGModel(
        trunk=ResNetTrunk(depth=10, dtype=jnp.float32),
        vrd=VRDHead(emb_dim=32, fc_dim=64, dtype=jnp.float32),
        n_rel=N_REL)


def make_batch(rng):
    image = rng.randn(B, H, W, 3).astype(np.float32) * 10
    im_info = np.tile([[H, W, 1.0]], (B, 1)).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    for b in range(B):
        for k in range(G):
            x1, y1 = rng.uniform(0, 40, 2)
            w, h = rng.uniform(8, 30, 2)
            boxes[b, k] = [x1, y1, min(x1 + w, W - 1), min(y1 + h, H - 1)]
    ix1 = rng.randint(0, G, (B, P)).astype(np.int32)
    ix2 = (ix1 + 1 + rng.randint(0, G - 1, (B, P))).astype(np.int32) % G
    pv = np.zeros((B, P), bool)
    pv[:, :5] = True
    labels = np.zeros((B, P, N_REL), np.float32)
    labels[:, :5, 2] = 1.0
    return {"image": jnp.asarray(image), "im_info": jnp.asarray(im_info),
            "obj_boxes": jnp.asarray(boxes), "ix1": jnp.asarray(ix1),
            "ix2": jnp.asarray(ix2), "pair_valid": jnp.asarray(pv),
            "rel_labels": jnp.asarray(labels)}


@pytest.fixture(scope="module")
def model_params_prd():
    model = make_model()
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    prd = jnp.asarray(rng.randn(N_REL, 300).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["image"][:1], batch["im_info"][0], batch["obj_boxes"][0],
        jnp.zeros((G,), jnp.int32), batch["ix1"][0], batch["ix2"][0],
        batch["pair_valid"][0], prd)["params"]
    return model, params, prd


def test_forward_scores_are_cosines(model_params_prd, rng):
    model, params, prd = model_params_prd
    batch = make_batch(rng)
    out = model.apply(
        {"params": params}, batch["image"][:1], batch["im_info"][0],
        batch["obj_boxes"][0], jnp.zeros((G,), jnp.int32), batch["ix1"][0],
        batch["ix2"][0], batch["pair_valid"][0], prd)
    s = np.asarray(out["scores"])
    assert s.shape == (P, N_REL)
    assert np.all(s >= -1.0001) and np.all(s <= 1.0001)


def test_head_on_features_matches_call(model_params_prd, rng):
    """Fused-serving path (shared trunk) must equal the two-pass path."""
    model, params, prd = model_params_prd
    batch = make_batch(rng)
    full = model.apply(
        {"params": params}, batch["image"][:1], batch["im_info"][0],
        batch["obj_boxes"][0], jnp.zeros((G,), jnp.int32), batch["ix1"][0],
        batch["ix2"][0], batch["pair_valid"][0], prd)
    fmap, _ = model.apply({"params": params}, batch["image"][:1],
                          method=lambda m, x: m.trunk(x))
    feat = model.apply(
        {"params": params}, fmap, batch["im_info"][0], batch["obj_boxes"][0],
        batch["ix1"][0], batch["ix2"][0], batch["pair_valid"][0], prd,
        method=SGGModel.head_on_features)
    np.testing.assert_allclose(np.asarray(full["scores"]),
                               np.asarray(feat["scores"]), rtol=1e-5)


def test_int8_fc_matches_fp32_scores(model_params_prd, rng):
    """DenseInt8 fc6/fc7 (serving quantization) restores the SAME param
    tree and must track the fp32 head's cosine scores closely — int8
    per-row/per-channel dynamic quantization noise on the two 4096-wide
    towers stays within a few hundredths on [-1, 1] logits."""
    model, params, prd = model_params_prd
    q_model = SGGModel(
        trunk=ResNetTrunk(depth=10, dtype=jnp.float32),
        vrd=VRDHead(emb_dim=32, fc_dim=64, dtype=jnp.float32, int8_fc=True),
        n_rel=N_REL)
    batch = make_batch(rng)
    args = (batch["image"][:1], batch["im_info"][0], batch["obj_boxes"][0],
            jnp.zeros((G,), jnp.int32), batch["ix1"][0], batch["ix2"][0],
            batch["pair_valid"][0], prd)
    # identical param tree: the quantized layer declares the same
    # kernel/bias names, so Stage-B checkpoints restore unchanged
    q_init = q_model.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, *args)["params"]
    assert (jax.tree_util.tree_structure(q_init)
            == jax.tree_util.tree_structure(params))
    ref = np.asarray(model.apply({"params": params}, *args)["scores"])
    quant = np.asarray(q_model.apply({"params": params}, *args)["scores"])
    assert np.max(np.abs(ref - quant)) < 0.05, np.max(np.abs(ref - quant))


def test_int8_fc_prequantized_bit_identical(model_params_prd, rng):
    """quantize_dense_params (load-time weight-quant hoist) must produce
    EXACTLY the on-the-fly DenseInt8 scores: same abs-max/round pipeline
    -> same integer taps, so the quant_ab quality gate carries over."""
    from i2vsgg_tpu.utils.params import quantize_dense_params
    model, params, prd = model_params_prd
    q_model = SGGModel(
        trunk=ResNetTrunk(depth=10, dtype=jnp.float32),
        vrd=VRDHead(emb_dim=32, fc_dim=64, dtype=jnp.float32, int8_fc=True),
        n_rel=N_REL)
    batch = make_batch(rng)
    args = (batch["image"][:1], batch["im_info"][0], batch["obj_boxes"][0],
            jnp.zeros((G,), jnp.int32), batch["ix1"][0], batch["ix2"][0],
            batch["pair_valid"][0], prd)
    onfly = np.asarray(q_model.apply({"params": params}, *args)["scores"])
    pq = quantize_dense_params(params)
    assert pq["vrd"]["fc6"]["kernel"].dtype == jnp.int8
    assert pq["vrd"]["fc7"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in pq["vrd"]["fc6"]
    # nothing else quantized (so_vis_embeddings etc. untouched)
    assert pq["vrd"]["so_vis_embeddings"]["kernel"].dtype != jnp.int8
    hoisted = np.asarray(q_model.apply({"params": pq}, *args)["scores"])
    np.testing.assert_array_equal(onfly, hoisted)


def test_union_dedup_is_exact(model_params_prd, rng):
    """pair_static (unordered-union dedup) must yield EXACTLY the same
    scores as per-ordered-pair unions: union boxes are symmetric."""
    from i2vsgg_tpu.serve import make_pair_indices, make_union_dedup
    model, params, prd = model_params_prd
    batch = make_batch(rng)
    ix1_np, ix2_np = make_pair_indices(G)      # static all-pairs layout
    pair_static = make_union_dedup(ix1_np, ix2_np)
    assert len(pair_static[0]) == len(ix1_np) // 2
    ix1 = jnp.asarray(ix1_np)
    ix2 = jnp.asarray(ix2_np)
    pv = jnp.ones((len(ix1_np),), bool)
    args = (batch["image"][:1], batch["im_info"][0], batch["obj_boxes"][0],
            jnp.zeros((G,), jnp.int32), ix1, ix2, pv, prd)
    plain = model.apply({"params": params}, *args)
    dedup = model.apply({"params": params}, *args, pair_static=pair_static)
    np.testing.assert_allclose(np.asarray(dedup["scores"]),
                               np.asarray(plain["scores"]),
                               rtol=1e-5, atol=1e-6)


def test_bce_loss_masks_invalid_pairs():
    scores = jnp.asarray(np.random.RandomState(0).randn(4, N_REL))
    labels = jnp.zeros((4, N_REL))
    pv_all = jnp.ones((4,), bool)
    pv_half = jnp.asarray([True, True, False, False])
    full = float(bce_multilabel_loss(scores, labels, pv_all))
    half = float(bce_multilabel_loss(scores, labels, pv_half))
    expect_half = float(bce_multilabel_loss(scores[:2], labels[:2],
                                            jnp.ones((2,), bool)))
    assert np.isclose(half, expect_half, rtol=1e-6)
    assert not np.isclose(full, half)


def test_build_pair_batch_dedupes_multilabel():
    # (s,p,o): pair (0,1) has TWO predicates -> one slot, two labels
    rels = [(0, 2, 1), (0, 4, 1), (1, 0, 2), (3, 6, 0)]
    ix1, ix2, labels, valid = build_pair_batch(rels, n_boxes=4,
                                               max_pairs=P, n_rel=N_REL)
    assert valid.sum() == 3
    assert labels[0, 2] == 1.0 and labels[0, 4] == 1.0
    assert (ix1[0], ix2[0]) == (0, 1)
    # out-of-range boxes dropped
    _, _, _, v2 = build_pair_batch([(9, 1, 0)], 4, P, N_REL)
    assert v2.sum() == 0


def test_train_step_updates_vrd_only(model_params_prd, rng):
    model, params, prd = model_params_prd
    tx = sgg_optimizer(1e-3, Config())
    state = create_train_state(params, tx)
    step = make_sgg_train_step(model, tx)
    batch = make_batch(rng)
    new_state, metrics = step(state, batch, prd, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    # vrd head moved
    w0 = params["vrd"]["fc_rel"]["kernel"]
    w1 = new_state.params["vrd"]["fc_rel"]["kernel"]
    assert float(jnp.max(jnp.abs(w1 - w0))) > 0
    # trunk untouched (frozen detector)
    t0 = params["trunk"]["layer3"]["block0"]["conv1"]["kernel"]
    t1 = new_state.params["trunk"]["layer3"]["block0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_loss_decreases_over_steps(model_params_prd, rng):
    model, params, prd = model_params_prd
    tx = sgg_optimizer(5e-2, Config())
    state = create_train_state(params, tx)
    step = make_sgg_train_step(model, tx)
    batch = make_batch(rng)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, prd, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
