"""Fixed-shape greedy NMS for TPU.

Semantics match the reference's de-facto CPU NMS
(``lib/model/nms/nms_cpu.py:6-34``): sort by score descending, greedily keep
the highest-scored box and suppress boxes with IoU > thresh (keep while
``ovr <= thresh``), using the +1 box-width convention.

TPU-native formulation: everything is static-shaped. Instead of a
data-dependent keep list we return a padded index vector + validity mask so
the op stays inside ``jit``, with zero host round-trips (the reference
bounced every NMS call to CPU numpy, ``nms_wrapper.py:20``).

Two implementations with identical keep sets:

* ``nms_indices`` (default) — **chunked suppression-matrix fixpoint**.
  Greedy NMS is the unique fixpoint of
  ``keep[i] = valid[i] & !any_{j<i}(keep[j] & iou[j,i] > t)`` over
  score-sorted boxes. Boxes are processed in score-order chunks: each chunk
  is first suppressed by the already-kept set (one (C, K) IoU sweep), then
  resolved internally by iterating the (C, C) fixpoint to convergence — a
  handful of vector×matrix passes on the VPU/MXU instead of one pivot scan
  per output. Sequential depth drops from O(max_out) to
  O(N/C * fixpoint_iters); exact because greedy's kept set is built in
  score order, so the first ``max_out`` kept boxes never depend on later
  ones (analogous chunking to the reference's 64-box-tile CUDA bitmask
  kernel, ``nms_kernel.cu:24-144``).
* ``nms_indices_sequential`` — the direct O(max_out)-pivot scan, kept as
  the semantics oracle for parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from i2vsgg_tpu.ops.boxes import box_area

NEG_INF = -1e10


def _iou_one_vs_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (N, 4) boxes, +1 convention."""
    area1 = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    areas = box_area(boxes)
    iw = jnp.maximum(0.0, jnp.minimum(box[2], boxes[:, 2])
                     - jnp.maximum(box[0], boxes[:, 0]) + 1.0)
    ih = jnp.maximum(0.0, jnp.minimum(box[3], boxes[:, 3])
                     - jnp.maximum(box[1], boxes[:, 1]) + 1.0)
    inter = iw * ih
    return inter / (area1 + areas - inter)


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU, +1 convention."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    iw = jnp.maximum(0.0, jnp.minimum(a[:, None, 2], b[None, :, 2])
                     - jnp.maximum(a[:, None, 0], b[None, :, 0]) + 1.0)
    ih = jnp.maximum(0.0, jnp.minimum(a[:, None, 3], b[None, :, 3])
                     - jnp.maximum(a[:, None, 1], b[None, :, 1]) + 1.0)
    inter = iw * ih
    return inter / (area_a + area_b - inter)


def _supp_fixpoint(supp, calive, c):
    """Iterate keep[i] = alive[i] & !any_j(keep[j] & supp[j,i]) to its
    fixpoint. ``supp`` must encode a strict priority DAG (j beats i), which
    guarantees convergence in <= chain-depth iterations (forward
    substitution on a triangular system). Two updates per while body halve
    the cond-sync count — the iterates form an antitone sandwich
    k_even ⊇ fix ⊇ k_odd, so consecutive-equality remains an exact
    convergence test."""
    def step(k):
        return calive & ~((k.astype(jnp.float32) @ supp) > 0.5)

    def cond(state):
        k, prev, it = state
        return jnp.any(k != prev) & (it < c)

    def body(state):
        k, _, it = state
        k1 = step(k)
        return step(k1), k1, it + 2

    k0 = calive
    k, _, _ = jax.lax.while_loop(cond, body, (step(k0), k0, jnp.asarray(0)))
    return k


def _chunk_fixpoint_keep(cboxes, calive, thresh):
    """Exact greedy keep mask WITHIN one score-sorted chunk, by iterating
    keep[i] = alive[i] & !any_{j<i}(keep[j] & supp[j,i]) to its (unique)
    fixpoint."""
    c = cboxes.shape[0]
    iou = _pairwise_iou(cboxes, cboxes)
    lower = (jnp.arange(c)[:, None] < jnp.arange(c)[None, :])   # j < i
    supp = ((iou > thresh) & lower).astype(jnp.float32)         # (C, C)
    return _supp_fixpoint(supp, calive, c)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_indices_unsorted(boxes: jnp.ndarray, scores: jnp.ndarray, thresh,
                         max_out: int, valid: jnp.ndarray | None = None):
    """Greedy NMS without any argsort: the score ORDER relation replaces the
    triangular mask (supp[j, i] = iou > t & j-beats-i, ties by index), the
    fixpoint runs over unsorted boxes, and the kept set is reduced to the
    top ``max_out`` by score with one top_k. Exact same keep set as
    ``nms_indices`` — built for the small-n per-class serving case where
    the full sort dominated (n ~ 300, max_out ~ 8).

    Returns (keep (max_out,) int32 score-ordered -1-padded, keep_valid).
    """
    n = boxes.shape[0]
    scores = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    alive = scores > NEG_INF / 2
    iou = _pairwise_iou(boxes, boxes)
    idx = jnp.arange(n)
    beats = (scores[:, None] > scores[None, :]) | (
        (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :]))
    supp = ((iou > thresh) & beats).astype(jnp.float32)
    k = _supp_fixpoint(supp, alive, n)
    kk = min(max_out, n)
    top_scores, top_idx = jax.lax.top_k(jnp.where(k, scores, NEG_INF), kk)
    if kk < max_out:                     # pad when max_out exceeds n
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((max_out - kk,), NEG_INF)])
        top_idx = jnp.concatenate(
            [top_idx, jnp.zeros((max_out - kk,), top_idx.dtype)])
    kv = top_scores > NEG_INF / 2
    return jnp.where(kv, top_idx.astype(jnp.int32), -1), kv


@functools.partial(jax.jit, static_argnames=("max_out", "chunk", "presorted"))
def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, thresh,
                max_out: int, valid: jnp.ndarray | None = None,
                chunk: int | None = None, presorted: bool = False):
    """Greedy NMS with fixed output size (chunked fixpoint formulation).

    Args:
      boxes: (N, 4) float boxes.
      scores: (N,) float scores.
      thresh: IoU suppression threshold (suppress when IoU > thresh).
      max_out: static number of outputs (pad with -1 / False).
      valid: optional (N,) bool mask; invalid boxes are never selected.
      chunk: chunk size (defaults to a bandwidth-friendly choice).
      presorted: caller guarantees score-descending order (e.g. proposals
        straight out of top_k) — skips a full argsort.

    Returns:
      keep: (max_out,) int32 indices into the input, -1 padded.
      keep_valid: (max_out,) bool.
    """
    n = boxes.shape[0]
    scores = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    if presorted:
        order = jnp.arange(n, dtype=jnp.int32)
        sboxes = boxes
        alive = scores > NEG_INF / 2
    else:
        order = jnp.argsort(-scores)
        sboxes = boxes[order]
        alive = scores[order] > NEG_INF / 2

    # chunk size trades sequential chunk count (n/c) against per-chunk
    # fixpoint cost (c^2). Measured on the 8x6000 proposal NMS (TPU v5e):
    # 384-512 is the sweet spot (3.4 ms) — 1024 costs 4.1, 2048 costs 5.5
    # (the per-chunk fixpoint iterations grow with c faster than the chunk
    # count shrinks)
    c = chunk or max(256, min(512, 4 * max_out))
    c = min(c, n)
    nchunks = -(-n // c)
    pad = nchunks * c - n
    if pad:
        sboxes = jnp.concatenate(
            [sboxes, jnp.zeros((pad, 4), sboxes.dtype)], axis=0)
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)], axis=0)

    kept_boxes0 = jnp.zeros((max_out, 4), sboxes.dtype)
    kept_pos0 = jnp.full((max_out,), -1, jnp.int32)   # position in sorted list
    kept_mask0 = jnp.zeros((max_out,), bool)

    def chunk_body(ci, state):
        kept_boxes, kept_pos, kept_mask, kept_count = state
        start = ci * c
        cb = jax.lax.dynamic_slice_in_dim(sboxes, start, c, axis=0)
        ca = jax.lax.dynamic_slice_in_dim(alive, start, c, axis=0)
        # suppression by the already-kept (earlier, higher-scored) boxes
        iou_k = _pairwise_iou(cb, kept_boxes)                   # (C, max_out)
        ca = ca & ~jnp.any((iou_k > thresh) & kept_mask[None, :], axis=1)
        # resolve within-chunk ordering exactly
        k = _chunk_fixpoint_keep(cb, ca, thresh)
        # append kept boxes (in order) to the output buffers
        dest = kept_count + jnp.cumsum(k.astype(jnp.int32)) - 1
        dest = jnp.where(k & (dest < max_out), dest, max_out)   # drop overflow
        kept_boxes = kept_boxes.at[dest].set(cb, mode="drop")
        kept_pos = kept_pos.at[dest].set(
            (start + jnp.arange(c)).astype(jnp.int32), mode="drop")
        kept_mask = kept_mask.at[dest].set(True, mode="drop")
        return kept_boxes, kept_pos, kept_mask, kept_count + jnp.sum(k)

    if nchunks == 1:
        # single-chunk case (per-class NMS: n ~ 300): one direct fixpoint,
        # no fori_loop / dynamic-slice / scatter-append machinery
        k = _chunk_fixpoint_keep(sboxes, alive, thresh)
        pos = jnp.where(k, jnp.arange(n + pad), n + pad)
        kk = min(max_out, n + pad)
        kept_pos, _ = jax.lax.top_k(-(pos.astype(jnp.int32)), kk)
        kept_pos = -kept_pos
        if kk < max_out:
            kept_pos = jnp.concatenate(
                [kept_pos, jnp.full((max_out - kk,), n + pad, jnp.int32)])
        kept_mask = kept_pos < n + pad
        kept_pos = jnp.minimum(kept_pos, n - 1)
    else:
        _, kept_pos, kept_mask, _ = jax.lax.fori_loop(
            0, nchunks, chunk_body,
            (kept_boxes0, kept_pos0, kept_mask0, jnp.asarray(0, jnp.int32)))
    keep = jnp.where(kept_mask, order[jnp.maximum(kept_pos, 0)].astype(
        jnp.int32), -1)
    return keep, kept_mask


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_indices_sequential(boxes: jnp.ndarray, scores: jnp.ndarray, thresh,
                           max_out: int, valid: jnp.ndarray | None = None):
    """Reference-style sequential pivot scan (semantics oracle).

    Same contract as ``nms_indices``.
    """
    scores = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    order = jnp.argsort(-scores)                       # score-descending
    sboxes = boxes[order]
    sscores = scores[order]
    alive = sscores > NEG_INF / 2                      # padded rows dead

    def body(k, state):
        alive, keep, keep_valid = state
        idx = jnp.argmax(alive)                        # first alive in order
        any_alive = alive[idx]
        iou = _iou_one_vs_many(sboxes[idx], sboxes)
        new_alive = alive & ~(iou > thresh)
        new_alive = new_alive.at[idx].set(False)       # pivot is consumed
        keep = keep.at[k].set(jnp.where(any_alive, order[idx].astype(jnp.int32), -1))
        keep_valid = keep_valid.at[k].set(any_alive)
        alive = jnp.where(any_alive, new_alive, alive)  # freeze when exhausted
        return alive, keep, keep_valid

    keep0 = jnp.full((max_out,), -1, dtype=jnp.int32)
    kv0 = jnp.zeros((max_out,), dtype=bool)
    _, keep, keep_valid = jax.lax.fori_loop(0, max_out, body, (alive, keep0, kv0))
    return keep, keep_valid


def batched_nms_indices(boxes, scores, thresh, max_out, valid=None):
    """vmap'd ``nms_indices`` over a leading batch/class axis."""
    fn = lambda b, s, v: nms_indices(b, s, thresh, max_out, v)
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)
    return jax.vmap(fn)(boxes, scores, valid)
