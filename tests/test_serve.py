"""Serving pipeline tests: on-device detection decode + the fused det+SGG
frame program, single-device and sharded over the virtual 8-device mesh
(video-axis data parallelism, SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.models.backbones import ResNetTrunk
from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
from i2vsgg_tpu.parallel.mesh import make_mesh, shard_batch
from i2vsgg_tpu.serve import (decode_detections, make_frame_program,
                              make_pair_indices)

CFG = Config().replace(
    TRAIN=Config().TRAIN.__class__(RPN_PRE_NMS_TOP_N=200,
                                   RPN_POST_NMS_TOP_N=32,
                                   RPN_POST_NMS_TOP_N_TARGET=16,
                                   RPN_BATCHSIZE=32, BATCH_SIZE=16,
                                   MAX_NUM_GT_BOXES=5),
    TEST=Config().TEST.__class__(RPN_PRE_NMS_TOP_N=100, RPN_POST_NMS_TOP_N=16),
    COMPUTE_DTYPE="float32")
N_CLASSES = 4


def test_decode_detections_known_case():
    """Two well-separated high-score boxes of different classes survive;
    rescaling by 1/im_scale is applied."""
    n = 8
    rois = np.zeros((1, n, 5), np.float32)
    rois[0, 0, 1:] = [10, 10, 30, 30]
    rois[0, 1, 1:] = [60, 60, 90, 90]
    rois[0, 2, 1:] = [11, 11, 31, 31]      # overlaps box 0, lower score
    valid = np.zeros((1, n), bool)
    valid[0, :3] = True
    cls_prob = np.zeros((1, n, N_CLASSES), np.float32)
    cls_prob[0, 0, 1] = 0.9
    cls_prob[0, 1, 2] = 0.8
    cls_prob[0, 2, 1] = 0.5                # NMS'd away by box 0 (IoU > 0.3)
    bbox_pred = np.zeros((1, n, 4 * N_CLASSES), np.float32)  # identity deltas
    im_info = np.asarray([[100, 100, 2.0]], np.float32)

    dets = decode_detections(jnp.asarray(rois), jnp.asarray(valid),
                             jnp.asarray(cls_prob), jnp.asarray(bbox_pred),
                             jnp.asarray(im_info), CFG, max_det=4,
                             max_per_class=4)
    v = np.asarray(dets.valid[0])
    assert v.sum() == 2
    order = np.argsort(-np.asarray(dets.scores[0]))[:2]
    classes = np.asarray(dets.classes[0])[order]
    boxes = np.asarray(dets.boxes[0])[order]
    assert classes.tolist() == [1, 2]
    # identity deltas round-trip the roi box up to the +1 width convention
    # (reference bbox_transform_inv semantics); output is /= scale
    np.testing.assert_allclose(boxes[0], np.asarray([10, 10, 30, 30]) / 2.0,
                               atol=0.6)
    np.testing.assert_allclose(boxes[1], np.asarray([60, 60, 90, 90]) / 2.0,
                               atol=0.6)


@pytest.fixture(scope="module")
def fused_models():
    b, h, w = 1, 64, 80
    det = FasterRCNN_DA(num_classes=N_CLASSES, cfg=CFG, backbone="res10")
    det_params = det.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((b, h, w, 3), jnp.float32),
        jnp.asarray([[h, w, 1.0]], jnp.float32), mode="inference")["params"]
    md = 4
    sgg = SGGModel(trunk=ResNetTrunk(depth=10, dtype=jnp.float32),
                   vrd=VRDHead(emb_dim=16, fc_dim=32), n_rel=5)
    ix = jnp.zeros((md * (md - 1),), jnp.int32)
    base = jnp.zeros((1, h // 16, w // 16, 1024), jnp.float32)
    prd = np.random.RandomState(0).randn(5, 300).astype(np.float32)
    sgg_params = sgg.init(
        {"params": jax.random.PRNGKey(1)}, base,
        jnp.asarray([h, w, 1.0]), jnp.zeros((md, 4)), ix, ix,
        jnp.zeros(ix.shape, bool), jnp.asarray(prd),
        method=SGGModel.head_on_features)["params"]
    return det, det_params, sgg, sgg_params, prd, md, (h, w)


def test_frame_program_shapes(fused_models):
    det, det_params, sgg, sgg_params, prd, md, (h, w) = fused_models
    program = make_frame_program(det, det_params, sgg, sgg_params, prd, CFG,
                                 max_det=md, max_per_class=4)
    b = 2
    images = jnp.asarray(
        np.random.RandomState(1).randn(b, h, w, 3).astype(np.float32) * 10)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))
    out = program(images, im_info)
    p = md * (md - 1)
    assert out["boxes"].shape == (b, md, 4)
    assert out["rel_prob"].shape == (b, p, 5)
    assert out["pair_valid"].shape == (b, p)
    rp = np.asarray(out["rel_prob"])
    np.testing.assert_allclose(rp.sum(-1), 1.0, rtol=1e-4)


def test_frame_program_sharded_over_mesh(fused_models):
    """Video-axis data parallelism: the same program with the frame batch
    sharded over the 8-device mesh produces identical results."""
    det, det_params, sgg, sgg_params, prd, md, (h, w) = fused_models
    program = make_frame_program(det, det_params, sgg, sgg_params, prd, CFG,
                                 max_det=md, max_per_class=4)
    b = 8
    images = np.random.RandomState(2).randn(b, h, w, 3).astype(np.float32) * 10
    im_info = np.tile([[h, w, 1.0]], (b, 1)).astype(np.float32)

    ref = jax.device_get(program(jnp.asarray(images), jnp.asarray(im_info)))

    mesh = make_mesh(8)
    with mesh:
        batch = shard_batch({"image": jnp.asarray(images),
                             "im_info": jnp.asarray(im_info)}, mesh)
        out = jax.device_get(program(batch["image"], batch["im_info"]))
    np.testing.assert_allclose(ref["boxes"], out["boxes"], atol=5e-3)
    np.testing.assert_allclose(ref["rel_prob"], out["rel_prob"], atol=5e-3)
    np.testing.assert_array_equal(ref["det_valid"], out["det_valid"])


def test_bucketed_program_matches_full(fused_models):
    """Pair bucketing is exact: a pair valid in the chosen bucket scores
    identically to the full fused program's same pair (only padding
    differs), and every valid pair of the full program appears."""
    from i2vsgg_tpu.serve import make_bucketed_program
    det, det_params, sgg, sgg_params, prd, md, (h, w) = fused_models
    full = make_frame_program(det, det_params, sgg, sgg_params, prd, CFG,
                              max_det=md, max_per_class=4)
    bucketed = make_bucketed_program(det, det_params, sgg, sgg_params, prd,
                                     CFG, buckets=(2, md),
                                     max_per_class=4)
    b = 2
    images = jnp.asarray(
        np.random.RandomState(3).randn(b, h, w, 3).astype(np.float32) * 10)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))
    ref = jax.device_get(full(images, im_info))
    out = jax.device_get(bucketed(images, im_info))
    bk = out["bucket"]
    assert bk in (2, md)
    np.testing.assert_array_equal(ref["boxes"], out["boxes"])

    # per frame: every valid pair in the FULL program must be present and
    # equal in the bucketed output
    for f in range(b):
        full_pairs = {(int(i), int(j)): ref["rel_prob"][f][k]
                      for k, (i, j) in enumerate(zip(ref["ix1"],
                                                     ref["ix2"]))
                      if ref["pair_valid"][f][k]}
        got_pairs = {(int(i), int(j)): out["rel_prob"][f][k]
                     for k, (i, j) in enumerate(zip(out["ix1"],
                                                    out["ix2"]))
                     if out["pair_valid"][f][k]}
        assert set(full_pairs) == set(got_pairs)
        for key in full_pairs:
            np.testing.assert_allclose(full_pairs[key], got_pairs[key],
                                       rtol=1e-5, atol=1e-5)


def test_frame_program_accepts_host_planes(fused_models, monkeypatch):
    """Serving input-contract lever: the fused program fed HOST-packed
    conv1 parity planes (Conv1Planes) is bit-identical to the same program
    fed images with the Pallas conv1 env switch on (same kernel; the only
    difference is WHERE the planes were built — numpy loader vs device)."""
    from i2vsgg_tpu.ops.pallas.conv1_kernel import Conv1Planes
    det, det_params, sgg, sgg_params, prd, md, (h, w) = fused_models
    program = make_frame_program(det, det_params, sgg, sgg_params, prd, CFG,
                                 max_det=md, max_per_class=4)
    b = 2
    images_np = (np.random.RandomState(4).randn(b, h, w, 3) * 10
                 ).astype(np.float32)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))
    monkeypatch.setenv("I2VSGG_PALLAS_CONV1", "1")
    ref = jax.device_get(program(jnp.asarray(images_np), im_info))
    monkeypatch.delenv("I2VSGG_PALLAS_CONV1")
    planes = Conv1Planes.pack(images_np)
    out = jax.device_get(program(planes, im_info))
    for k in ("boxes", "scores", "rel_prob"):
        np.testing.assert_array_equal(ref[k], out[k])
    np.testing.assert_array_equal(ref["det_valid"], out["det_valid"])
    np.testing.assert_array_equal(ref["pair_valid"], out["pair_valid"])
