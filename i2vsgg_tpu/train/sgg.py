"""Relation-head (SGG) training step — Stage B.

Rebuild of the intended flow of ``trainval_net_SGG_emb.py:48-323`` (the
reference driver is broken as shipped, SURVEY.md §8.1 — this defines the
canonical behavior): per image, ground-truth object pairs are scored by the
``vrd`` head against GloVe predicate embeddings and trained with multi-label
BCE. The backbone is frozen — the reference enforces this with a
GPU->numpy->GPU round-trip (``faster_rcnn_SGG_emb.py:148-160``); here it is
an on-device ``lax.stop_gradient`` inside ``SGGModel``, so the whole step is
one jitted SPMD program with batches sharded over the mesh's data axis.

Pairs are padded to a static ``max_pairs`` with a validity mask (replacing
the reference's per-image dynamic pair counts,
``faster_rcnn_SGG_emb.py:186-237``).

Optimizer parity: the reference gives vrd params ``args.vrd_lr`` and leaves
the rest of the network in the param list at ``lr`` where they receive zero
gradient (``trainval_net_SGG_emb.py:129-144``); here the trunk is labeled
frozen outright.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.models.sgg import bce_multilabel_loss
from i2vsgg_tpu.train.det_da import TrainState, create_train_state


def sgg_optimizer(vrd_lr: float | Callable[[int], float], cfg: Config):
    """SGD(momentum) over the vrd head only; trunk frozen.

    Param-group semantics match the reference driver exactly
    [trainval_net_SGG_emb.py:129-148]: vrd WEIGHTS at ``vrd_lr`` with
    ``cfg.TRAIN.WEIGHT_DECAY``; vrd BIASES at ``2x vrd_lr`` (DOUBLE_BIAS)
    with zero decay (BIAS_DECAY=False). Round-3 fix: the previous version
    applied single-lr + decay-on-everything to the whole head — a
    systematic optimizer asymmetry vs the reference in parity runs.
    """
    t = cfg.TRAIN
    if not callable(vrd_lr):
        base = float(vrd_lr)
        schedule = lambda step: base  # noqa: E731
    else:
        schedule = vrd_lr

    def label(params):
        def one(path, _):
            top = getattr(path[0], "key", str(path[0]))
            if top == "trunk":
                return "frozen"
            leaf = getattr(path[-1], "key", str(path[-1]))
            return "bias" if leaf == "bias" else "weight"
        return jax.tree_util.tree_map_with_path(one, params)

    def group(double_lr: bool, decay: bool):
        chain = []
        if decay and t.WEIGHT_DECAY:
            chain.append(optax.add_decayed_weights(t.WEIGHT_DECAY))
        chain.append(optax.trace(decay=t.MOMENTUM))
        mult = 2.0 if (double_lr and t.DOUBLE_BIAS) else 1.0
        chain.append(optax.scale_by_schedule(
            lambda step: -mult * schedule(step)))
        return optax.chain(*chain)

    return optax.multi_transform(
        {"weight": group(False, True), "bias": group(True, bool(t.BIAS_DECAY)),
         "frozen": optax.set_to_zero()}, label)


def sgg_loss(params, model, batch: Dict[str, Any], prd_vecs, rngs):
    """Mean multi-label BCE over the batch's valid GT pairs.

    batch:
      image:      (B, H, W, 3)
      im_info:    (B, 3)
      obj_boxes:  (B, G, 4)   input-scale GT boxes (zero-padded)
      ix1, ix2:   (B, P)      subject/object indices into obj_boxes
      pair_valid: (B, P)      bool
      rel_labels: (B, P, R)   multi-label predicate matrix
    """
    def one(img, info, boxes, ix1, ix2, pv, labels):
        out = model.apply(
            {"params": params}, img[None], info, boxes,
            jnp.zeros((boxes.shape[0],), jnp.int32), ix1, ix2, pv, prd_vecs,
            deterministic=False, rngs=rngs)
        loss = bce_multilabel_loss(out["scores"], labels, pv)
        return loss, jnp.sum(pv)

    losses, npairs = jax.vmap(one)(
        batch["image"], batch["im_info"], batch["obj_boxes"], batch["ix1"],
        batch["ix2"], batch["pair_valid"], batch["rel_labels"])
    # weight per-image losses by their valid-pair counts so the batch mean
    # equals the mean over all pairs (reference accumulates per image, bs=1)
    w = npairs.astype(losses.dtype)
    loss = jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss, {"loss": loss, "n_pairs": jnp.sum(npairs)}


def make_sgg_train_step(model, tx):
    """(state, batch, prd_vecs, key) -> (state, metrics), fully jitted."""

    @jax.jit
    def train_step(state: TrainState, batch, prd_vecs, key):
        rngs = {"dropout": key}
        (_, metrics), grads = jax.value_and_grad(sgg_loss, has_aux=True)(
            state.params, model, batch, prd_vecs, rngs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def build_pair_batch(gt_rels: Sequence[Sequence[int]], n_boxes: int,
                     max_pairs: int, n_rel: int):
    """Host-side: dedupe (s,o) pairs of one image into a padded multi-label
    batch row. [faster_rcnn_SGG_emb.py:186-237]

    Args:
      gt_rels: iterable of (subj_idx, predicate_id, obj_idx) triples.
      n_boxes: number of valid GT boxes in the image.
    Returns (ix1, ix2, labels, valid) numpy arrays of static size max_pairs.
    """
    import numpy as np
    pair_to_slot: Dict[tuple, int] = {}
    ix1 = np.zeros((max_pairs,), np.int32)
    ix2 = np.zeros((max_pairs,), np.int32)
    labels = np.zeros((max_pairs, n_rel), np.float32)
    valid = np.zeros((max_pairs,), bool)
    for s, p, o in gt_rels:
        if s >= n_boxes or o >= n_boxes or p >= n_rel:
            continue
        key = (int(s), int(o))
        if key not in pair_to_slot:
            if len(pair_to_slot) >= max_pairs:
                continue
            slot = len(pair_to_slot)
            pair_to_slot[key] = slot
            ix1[slot], ix2[slot] = key
            valid[slot] = True
        labels[pair_to_slot[key], int(p)] = 1.0
    return ix1, ix2, labels, valid
