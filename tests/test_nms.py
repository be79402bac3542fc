"""NMS parity tests against an independent numpy implementation of the
reference's CPU NMS semantics (lib/model/nms/nms_cpu.py:6-34)."""

import numpy as np
import jax.numpy as jnp

from i2vsgg_tpu.ops.nms import nms_indices, batched_nms_indices


def np_greedy_nms(dets, thresh):
    """Reference semantics: keep order of descending score, suppress ovr>thresh."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return np.array(keep, np.int64)


def rand_dets(rng, n, span=120):
    x1 = rng.uniform(0, span, n)
    y1 = rng.uniform(0, span, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], 1).astype(np.float32)


def test_nms_matches_reference_semantics(rng):
    for n in (1, 7, 64, 300):
        dets = rand_dets(rng, n)
        exp = np_greedy_nms(dets, 0.5)
        keep, valid = nms_indices(jnp.asarray(dets[:, :4]),
                                  jnp.asarray(dets[:, 4]), 0.5, max_out=n)
        got = np.asarray(keep)[np.asarray(valid)]
        np.testing.assert_array_equal(got, exp)


def test_nms_max_out_truncation(rng):
    dets = rand_dets(rng, 100)
    exp = np_greedy_nms(dets, 0.7)
    keep, valid = nms_indices(jnp.asarray(dets[:, :4]),
                              jnp.asarray(dets[:, 4]), 0.7, max_out=5)
    got = np.asarray(keep)[np.asarray(valid)]
    np.testing.assert_array_equal(got, exp[:len(got)])
    assert len(got) == min(5, len(exp))


def test_nms_valid_mask(rng):
    dets = rand_dets(rng, 50)
    valid_in = np.zeros(50, bool)
    valid_in[:20] = True
    exp = np_greedy_nms(dets[:20], 0.5)
    keep, valid = nms_indices(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                              0.5, max_out=50, valid=jnp.asarray(valid_in))
    got = np.asarray(keep)[np.asarray(valid)]
    np.testing.assert_array_equal(got, exp)


def test_nms_identical_boxes():
    # duplicates of one box: only one survives
    boxes = jnp.asarray(np.tile([[10.0, 10, 50, 50]], (8, 1)))
    scores = jnp.asarray(np.linspace(0.1, 0.9, 8, dtype=np.float32))
    keep, valid = nms_indices(boxes, scores, 0.5, max_out=8)
    assert int(np.asarray(valid).sum()) == 1
    assert int(np.asarray(keep)[0]) == 7  # highest score


def test_batched_nms(rng):
    dets = np.stack([rand_dets(rng, 40) for _ in range(3)])
    keep, valid = batched_nms_indices(
        jnp.asarray(dets[..., :4]), jnp.asarray(dets[..., 4]), 0.4, 40)
    for b in range(3):
        exp = np_greedy_nms(dets[b], 0.4)
        got = np.asarray(keep[b])[np.asarray(valid[b])]
        np.testing.assert_array_equal(got, exp)


def test_chunked_fixpoint_matches_sequential(rng):
    """The chunked suppression-matrix NMS must produce EXACTLY the greedy
    keep set of the sequential pivot scan, across sizes and thresholds."""
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.nms import nms_indices, nms_indices_sequential

    for trial in range(8):
        n = [17, 64, 150, 300, 700, 1000, 2000, 333][trial]
        thresh = [0.3, 0.5, 0.7, 0.3, 0.7, 0.5, 0.7, 0.3][trial]
        max_out = min(n, [5, 20, 50, 300, 100, 1000, 128, 64][trial])
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 200, n)
        boxes[:, 1] = rng.uniform(0, 200, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 80, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 80, n)
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1

        k1, v1 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                             thresh, max_out, jnp.asarray(valid))
        k2, v2 = nms_indices_sequential(jnp.asarray(boxes),
                                        jnp.asarray(scores), thresh,
                                        max_out, jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2),
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2),
                                      err_msg=f"trial {trial}")


def test_chunked_fixpoint_chunk_size_invariance(rng):
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.nms import nms_indices

    n = 500
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 100, n)
    boxes[:, 1] = rng.uniform(0, 100, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 60, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 60, n)
    scores = rng.rand(n).astype(np.float32)
    outs = [nms_indices(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64,
                        chunk=c) for c in (32, 100, 500)]
    for k, v in outs[1:]:
        np.testing.assert_array_equal(np.asarray(outs[0][0]), np.asarray(k))
        np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(v))


def test_sortfree_matches_sorted(rng):
    """nms_indices_unsorted (score-relation mask, no argsort) must produce
    the same keep set and order as nms_indices across sizes/thresholds/masks,
    including max_out truncation."""
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.nms import nms_indices, nms_indices_unsorted

    for trial in range(6):
        n = [1, 13, 64, 300, 500, 300][trial]
        thresh = [0.5, 0.3, 0.5, 0.3, 0.7, 0.5][trial]
        max_out = min(n, [4, 8, 8, 8, 64, 300][trial])
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, 200, n)
        boxes[:, 1] = rng.uniform(0, 200, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 80, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 80, n)
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        k1, v1 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores),
                             thresh, max_out, jnp.asarray(valid))
        k2, v2 = nms_indices_unsorted(jnp.asarray(boxes), jnp.asarray(scores),
                                      thresh, max_out, jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2),
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2),
                                      err_msg=f"trial {trial}")


def test_sortfree_max_out_exceeds_n(rng):
    """max_out > n must pad (the eval drivers cap detections above the
    proposal count on tiny configs)."""
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.nms import nms_indices, nms_indices_unsorted
    dets = rand_dets(rng, 16)
    k1, v1 = nms_indices(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                         0.5, max_out=20)
    k2, v2 = nms_indices_unsorted(jnp.asarray(dets[:, :4]),
                                  jnp.asarray(dets[:, 4]), 0.5, max_out=20)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_sortfree_tie_break(rng):
    """Identical scores: ties resolve by lower index first (stable-sort
    semantics), matching nms_indices."""
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.nms import nms_indices, nms_indices_unsorted
    boxes = np.asarray([[0, 0, 10, 10], [100, 100, 120, 120],
                        [1, 1, 11, 11], [101, 101, 121, 121]], np.float32)
    scores = np.asarray([0.5, 0.5, 0.5, 0.5], np.float32)
    k1, v1 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores), 0.3, 4)
    k2, v2 = nms_indices_unsorted(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.3, 4)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_presorted_matches_unsorted(rng):
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.nms import nms_indices

    n = 400
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 150, n)
    boxes[:, 1] = rng.uniform(0, 150, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 70, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 70, n)
    scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
    k1, v1 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
    k2, v2 = nms_indices(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64,
                         presorted=True)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
