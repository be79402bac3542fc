"""Checkpoint save/restore with the reference's three restoration filters.

The reference saves ``{session, epoch, model, optimizer, pooling_mode,
class_agnostic}`` per epoch (``trainval_net_instance_styleD_bilinear.py:421-434``)
and restores in three modes (SURVEY.md §5):

1. **detector init** — load a pretrained detector but skip the
   discriminator + classification/regression heads so they re-init for the
   new class set / DA run (exclusion list ``trainval_…:153-183``).
2. **full resume** — params + optimizer state + step.
3. **SGG init** — copy only non-``vrd`` (trunk) params from a Stage-A
   detector checkpoint into the Stage-B model (``trainval_net_SGG_emb.py:155-173``).

Storage is orbax (async-capable, sharding-aware); config metadata travels in
a sidecar JSON exactly like ``pooling_mode`` travels inside reference
checkpoints.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                                    # pragma: no cover
    _HAVE_ORBAX = False

from i2vsgg_tpu.train.det_da import TrainState

# Parameter paths excluded in detector-init mode — the flax equivalents of
# the reference's EXACT name list (trainval_net_instance_styleD_bilinear.py:154:
# ['netD_pixel','RPN_cls_score','RPN_bbox_pred','RCNN_cls_score',
#  'RCNN_bbox_pred']). Note what the reference KEEPS: RPN_Conv (rpn/conv)
# and netD_style load from the checkpoint when present. "cls_score" /
# "bbox_pred" match segment-aligned anywhere in the path, covering both the
# RPN convs (rpn/cls_score) and the RCNN heads (top-level cls_score).
DETECTOR_INIT_EXCLUDE = (
    "netD_pixel", "cls_score", "bbox_pred",
)


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")


def _is_step_dir(name: str) -> bool:
    """Exactly ``step_<digits>`` — stray entries like ``step_7.bak`` must
    not crash GC / latest-step discovery."""
    parts = name.split("_")
    return len(parts) == 2 and parts[0] == "step" and parts[1].isdigit()


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    metadata: Optional[Dict[str, Any]] = None,
                    keep_last: Optional[int] = None,
                    metric: Optional[float] = None,
                    higher_better: bool = True) -> str:
    """Save params + optimizer + step, with JSON metadata sidecar.

    Args:
      keep_last: if set, garbage-collect older ``step_*`` checkpoints so at
        most ``keep_last`` remain — the best-metric checkpoint (tracked in
        ``best.json``) is always retained in addition.
      metric: eval metric of this checkpoint (e.g. mAP). When better than
        the stored best, ``best.json`` is updated to point here.
    """
    path = _ckpt_path(ckpt_dir, step)
    os.makedirs(path, exist_ok=True)
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "tree"), tree, force=True)
    else:                                            # pragma: no cover
        import pickle
        with open(os.path.join(path, "tree.pkl"), "wb") as f:
            pickle.dump(jax.device_get(tree), f)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata or {}, f)
    if metric is not None:
        prev = best_checkpoint(ckpt_dir)
        better = (prev is None or
                  (metric > prev["metric"] if higher_better
                   else metric < prev["metric"]))
        if better:
            with open(os.path.join(os.path.abspath(ckpt_dir),
                                   "best.json"), "w") as f:
                json.dump({"step": step, "metric": float(metric),
                           "higher_better": higher_better}, f)
    if keep_last is not None:
        gc_checkpoints(ckpt_dir, keep_last)
    return path


def best_checkpoint(ckpt_dir: str) -> Optional[Dict[str, Any]]:
    """{"step", "metric"} of the best-metric checkpoint, or None."""
    p = os.path.join(os.path.abspath(ckpt_dir), "best.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def gc_checkpoints(ckpt_dir: str, keep_last: int) -> None:
    """Delete all but the newest ``keep_last`` step checkpoints; the
    best-metric checkpoint is always kept."""
    import shutil
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return
    steps = sorted(int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
                   if _is_step_dir(d))
    best = best_checkpoint(ckpt_dir)
    keep = set(steps[-keep_last:]) if keep_last > 0 else set()
    if best is not None:
        keep.add(int(best["step"]))
    for s in steps:
        if s not in keep:
            shutil.rmtree(_ckpt_path(ckpt_dir, s), ignore_errors=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if _is_step_dir(d)]
    return max(steps) if steps else None


def _load_tree(path: str):
    if _HAVE_ORBAX and os.path.isdir(os.path.join(path, "tree")):
        return ocp.PyTreeCheckpointer().restore(os.path.join(path, "tree"))
    import pickle                                    # pragma: no cover
    with open(os.path.join(path, "tree.pkl"), "rb") as f:
        return pickle.load(f)


def load_metadata(ckpt_dir: str, step: int) -> Dict[str, Any]:
    with open(os.path.join(_ckpt_path(ckpt_dir, step), "metadata.json")) as f:
        return json.load(f)


def restore_full(ckpt_dir: str, step: int, state: TrainState) -> TrainState:
    """Mode 2: full resume (params + optimizer + step).
    [trainval_…:186-196]"""
    tree = _load_tree(_ckpt_path(ckpt_dir, step))
    # orbax returns plain dicts/lists — rebuild the optax NamedTuple
    # structure by unflattening into the reference state's treedef
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    restored = jax.tree.unflatten(jax.tree.structure(target),
                                  jax.tree.leaves(tree))
    return TrainState(restored["params"], restored["opt_state"],
                      restored["step"])


def _merge_filtered(init_params, ckpt_params, skip: Sequence[str],
                    keep_only_roots: Optional[Sequence[str]] = None,
                    stats: Optional[Dict[str, int]] = None):
    """Copy ckpt values over init values, path-filtered, with
    shape-intersection at the leaf level (the reference's test-time
    intersection load, test_net_instance_styleD_bilinear.py:76-79).

    ``skip`` entries match segment-aligned anywhere in the "/"-joined path
    (like the reference's ``tag in k`` name filtering), so "cls_score"
    excludes both ``cls_score`` and ``rpn/cls_score``.
    """
    from flax import traverse_util

    flat_init = traverse_util.flatten_dict(init_params)
    flat_ckpt = traverse_util.flatten_dict(ckpt_params)

    def skipped(path) -> bool:
        joined = "/" + "/".join(path) + "/"
        return any(f"/{s}/" in joined for s in skip)

    out = {}
    copied = named = 0
    for path, ref in flat_init.items():
        new = flat_ckpt.get(path)
        if (new is None or skipped(path)
                or (keep_only_roots is not None
                    and path[0] not in keep_only_roots)):
            out[path] = ref
            continue
        named += 1
        ref_a, new_a = np.asarray(ref), np.asarray(new)
        if ref_a.shape == new_a.shape:
            out[path] = new_a
            copied += 1
        else:
            out[path] = ref_a
    if stats is not None:
        stats["copied"], stats["named"] = copied, named
        stats["total"] = len(flat_init)
    return traverse_util.unflatten_dict(out)


def restore_detector_init(ckpt_dir: str, step: int, init_params):
    """Mode 1: detector init — skip discriminators + RPN/RCNN heads.
    [trainval_…:153-183]"""
    tree = _load_tree(_ckpt_path(ckpt_dir, step))
    return _merge_filtered(init_params, tree["params"],
                           skip=DETECTOR_INIT_EXCLUDE)


def restore_sgg_init(det_ckpt_dir: str, step: int, sgg_init_params):
    """Mode 3: Stage-B init — copy only the trunk from a Stage-A checkpoint
    (everything that is not the vrd head). [trainval_net_SGG_emb.py:155-173]"""
    tree = _load_tree(_ckpt_path(det_ckpt_dir, step))
    return _merge_filtered(sgg_init_params, tree["params"],
                           skip=(), keep_only_roots=("trunk",))


def restore_intersection(ckpt_dir: str, step: int, init_params,
                         min_match: float = 0.9):
    """Test-time load: copy every param whose name+shape matches.
    [test_net_instance_styleD_bilinear.py:76-79]

    Unlike the reference's silent intersection load, a low NAME-match
    fraction here raises: evaluating a mostly-random-init model produces
    degenerate detections and mAP ~0 that can masquerade as a (vacuously
    passing) quality-gate result — exactly what happened when a res50
    checkpoint was evaluated with a res101 model (runs/capacity_ab_r64,
    round 4: the extra-depth layer names simply don't exist in the ckpt).
    Name-matched leaves whose SHAPES differ stay at init without erroring
    — that is the intended intersection semantics (e.g. a new class count
    changing head shapes). Pass ``min_match=0`` for a deliberately
    partial load.
    """
    tree = _load_tree(_ckpt_path(ckpt_dir, step))
    stats: Dict[str, int] = {}
    out = _merge_filtered(init_params, tree["params"], skip=(),
                          stats=stats)
    frac = stats["named"] / max(stats["total"], 1)
    if frac < min_match:
        raise ValueError(
            f"checkpoint {ckpt_dir}@{step} names only {stats['named']}"
            f"/{stats['total']} params ({frac:.0%}) of the model — "
            "wrong --net / architecture for this checkpoint?")
    return out
