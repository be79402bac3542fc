"""Fixed-shape greedy NMS for TPU.

Semantics match the reference's de-facto CPU NMS
(``lib/model/nms/nms_cpu.py:6-34``): sort by score descending, greedily keep
the highest-scored box and suppress boxes with IoU > thresh (keep while
``ovr <= thresh``), using the +1 box-width convention.

TPU-native formulation: everything is static-shaped. Instead of a
data-dependent keep list we return a padded index vector + validity mask so
the op stays inside ``jit``. ``nms_indices`` runs ``max_out`` sequential pivot
steps, each a fully vectorized one-vs-all IoU sweep on the VPU — O(max_out)
sequential depth, O(max_out * N) work, zero host round-trips (the reference
bounced every NMS call to CPU numpy, ``nms_wrapper.py:20``).

A tiled Pallas variant for very large N lives in
``i2vsgg_tpu/ops/pallas/nms_kernel.py`` (used when profitable).
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


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, thresh,
                max_out: int, valid: jnp.ndarray | None = None):
    """Greedy NMS with fixed output size.

    Args:
      boxes: (N, 4) float boxes.
      scores: (N,) float scores.
      thresh: IoU suppression threshold (suppress when IoU > thresh).
      max_out: static number of outputs (pad with -1 / False).
      valid: optional (N,) bool mask; invalid boxes are never selected.

    Returns:
      keep: (max_out,) int32 indices into the input, -1 padded.
      keep_valid: (max_out,) bool.
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
