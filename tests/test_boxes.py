"""Unit tests for the box geometry core against independent numpy references
implementing the semantics documented in SURVEY.md §2 (the reference's +1
width conventions, padded-GT masking, dual-mask rasterization)."""

import math

import numpy as np
import jax.numpy as jnp

from i2vsgg_tpu.ops import boxes as B


def np_encode(ex, gt):
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * ew
    ecy = ex[:, 1] + 0.5 * eh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return np.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     np.log(gw / ew), np.log(gh / eh)], 1)


def rand_boxes(rng, n, lo=0, hi=200):
    x1 = rng.uniform(lo, hi - 20, n)
    y1 = rng.uniform(lo, hi - 20, n)
    w = rng.uniform(2, 50, n)
    h = rng.uniform(2, 50, n)
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def test_encode_matches_numpy(rng):
    ex, gt = rand_boxes(rng, 17), rand_boxes(rng, 17)
    np.testing.assert_allclose(
        np.asarray(B.encode_boxes(ex, gt)), np_encode(ex, gt),
        rtol=1e-4, atol=1e-4)


def test_encode_decode_roundtrip(rng):
    # The reference decode (bbox_transform_inv) inherits py-faster-rcnn's
    # convention mismatch: encode uses +1 widths but decode emits
    # x2' = cx + 0.5*w, so a perfect roundtrip lands on (x1, y1, x2+1, y2+1).
    # We reproduce that exactly for parity.
    ex, gt = rand_boxes(rng, 23), rand_boxes(rng, 23)
    deltas = B.encode_boxes(ex, gt)
    rec = B.decode_boxes(jnp.asarray(ex), deltas)
    exp = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(np.asarray(rec), exp, rtol=1e-4, atol=1e-3)


def test_decode_multiclass_packing(rng):
    ex = rand_boxes(rng, 7)
    deltas = rng.uniform(-0.2, 0.2, (7, 12)).astype(np.float32)
    out = np.asarray(B.decode_boxes(jnp.asarray(ex), jnp.asarray(deltas)))
    assert out.shape == (7, 12)
    # class k decodes identically to slicing deltas[:, 4k:4k+4]
    for k in range(3):
        single = np.asarray(
            B.decode_boxes(jnp.asarray(ex), jnp.asarray(deltas[:, 4 * k:4 * k + 4])))
        np.testing.assert_allclose(out[:, 4 * k:4 * k + 4], single, rtol=1e-5)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -3.0, 250.0, 120.0]])
    out = np.asarray(B.clip_boxes(b, (100.0, 200.0)))  # H=100, W=200
    np.testing.assert_allclose(out, [[0.0, 0.0, 199.0, 99.0]])


def test_pairwise_iou_matches_numpy(rng):
    a, q = rand_boxes(rng, 11), rand_boxes(rng, 13)
    got = np.asarray(B.pairwise_iou(a, q))
    exp = np.zeros((11, 13))
    for i in range(11):
        for j in range(13):
            iw = min(a[i, 2], q[j, 2]) - max(a[i, 0], q[j, 0]) + 1
            ih = min(a[i, 3], q[j, 3]) - max(a[i, 1], q[j, 1]) + 1
            inter = max(iw, 0) * max(ih, 0)
            ua = ((a[i, 2] - a[i, 0] + 1) * (a[i, 3] - a[i, 1] + 1)
                  + (q[j, 2] - q[j, 0] + 1) * (q[j, 3] - q[j, 1] + 1) - inter)
            exp[i, j] = inter / ua
    np.testing.assert_allclose(got, exp, rtol=1e-5)
    # identity
    np.testing.assert_allclose(np.diag(np.asarray(B.pairwise_iou(a, a))), 1.0,
                               rtol=1e-6)


def test_pairwise_iou_padded_sentinels(rng):
    a = rand_boxes(rng, 5)
    a[2] = 0.0  # degenerate candidate
    gt = np.zeros((4, 5), np.float32)
    gt[0, :4] = [10, 10, 50, 50]
    out = np.asarray(B.pairwise_iou_padded(a, gt))
    # padded gt rows -> 0, except where the degenerate-box sentinel (-1)
    # overrides them (the reference applies the box mask second, so it wins:
    # bbox_transform.py:215-217)
    assert (out[[0, 1, 3, 4]][:, 1:] == 0.0).all()
    assert (out[2] == -1.0).all()             # degenerate box row -> -1


def test_union_boxes():
    a = jnp.asarray([30.0, 40.0, 60.0, 80.0])
    b = jnp.asarray([50.0, 20.0, 100.0, 70.0])
    out = np.asarray(B.union_boxes(a, b, 90, 105, margin=10))
    np.testing.assert_allclose(out, [20.0, 10.0, 105.0, 90.0])


def test_dual_mask_matches_reference_math(rng):
    ih, iw = 375, 500
    for _ in range(10):
        bb = rand_boxes(rng, 1, 0, 370)[0]
        got = np.asarray(B.dual_mask(ih, iw, jnp.asarray(bb)))
        # independent numpy version of resnet_SGG_emb.py:246-256
        rh, rw = 32.0 / ih, 32.0 / iw
        x1 = max(0, int(math.floor(bb[0] * rw)))
        x2 = min(32, int(math.ceil(bb[2] * rw)))
        y1 = max(0, int(math.floor(bb[1] * rh)))
        y2 = min(32, int(math.ceil(bb[3] * rh)))
        exp = np.zeros((32, 32), np.float32)
        exp[y1:y2, x1:x2] = 1
        np.testing.assert_array_equal(got, exp)


def test_relative_loc():
    a = np.array([10.0, 20.0, 30.0, 60.0], np.float32)
    b = np.array([20.0, 10.0, 60.0, 30.0], np.float32)
    out = np.asarray(B.relative_loc(jnp.asarray(a), jnp.asarray(b)))
    sw, sh, ow, oh = 20.0, 40.0, 40.0, 20.0
    exp = np.hstack([
        [(10 - 20) / ow, (20 - 10) / oh, (20 - 10) / sw, (10 - 20) / sh],
        np.log([sw / ow, sh / oh, ow / sw, oh / sh])])
    np.testing.assert_allclose(out, exp, rtol=1e-5)


def test_smooth_l1_loss_golden():
    # hand-computed: sigma=1, quadratic below 1, linear above
    pred = jnp.asarray([[0.5, 2.0]])
    tgt = jnp.zeros((1, 2))
    w = jnp.ones((1, 2))
    got = float(B.smooth_l1_loss(pred, tgt, w, w, sigma=1.0))
    exp = (0.5 * 0.5 ** 2) + (2.0 - 0.5)
    np.testing.assert_allclose(got, exp, rtol=1e-6)
