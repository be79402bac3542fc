"""Adversarial domain-adaptive detection training step (Stage A).

One jitted SPMD program reproducing the per-step loss assembly of
``trainval_net_instance_styleD_bilinear.py:256-341``:

    loss = rpn_cls + rpn_box + rcnn_cls + rcnn_box            (source)
         + 0.5*mean(D_inst_s^2) + 0.5*mean((1-D_inst_t)^2)    (LSGAN instance)
         + style_lambda * (0.5*mean(D_sty_s^2)
                           + 0.5*mean((1-D_sty_t)^2))         (LSGAN style)
         [+ consistency MSE terms when cr]

with the GRL inside the discriminators flipping their gradients into the
trunk. Unlike the reference (which runs source and target as two sequential
``forward``s with a Python loop between), both passes live in one jit so XLA
can overlap them, and the whole step — including SGD — is a single device
program. Batches shard over the mesh's data axis; the global-mean losses
make XLA insert the gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from i2vsgg_tpu.models.discriminators import (lsgan_source_loss,
                                              lsgan_target_loss)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def det_da_loss(params, model, batch_s, batch_t, rngs, *,
                eta: float, eta_style: float, style_lambda: float,
                cr: bool):
    """Full per-step loss. Returns (loss, metrics)."""
    out_s = model.apply(
        {"params": params}, batch_s["image"], batch_s["im_info"],
        batch_s["gt_boxes"], mode="train_source", eta=eta,
        eta_style=eta_style, rngs=rngs)
    out_t = model.apply(
        {"params": params}, batch_t["image"], batch_t["im_info"],
        mode="target", eta=eta, eta_style=eta_style,
        rngs={"dropout": rngs["dropout"]})

    loss_det = (out_s["rpn_loss_cls"] + out_s["rpn_loss_box"]
                + out_s["rcnn_loss_cls"] + out_s["rcnn_loss_bbox"])

    # LSGAN terms [trainval...:284-295]. Like the reference, padded target
    # rois participate (it pools the zero-padded rois too).
    dloss_s_p = lsgan_source_loss(out_s["d_instance"])
    dloss_s_style = lsgan_source_loss(out_s["d_style"])
    dloss_t_p = lsgan_target_loss(out_t["d_instance"])
    dloss_t_style = lsgan_target_loss(out_t["d_style"])
    loss_style = style_lambda * (dloss_s_style + dloss_t_style)

    loss = loss_det + dloss_s_p + dloss_t_p + loss_style
    metrics = {
        "loss_rpn_cls": out_s["rpn_loss_cls"],
        "loss_rpn_box": out_s["rpn_loss_box"],
        "loss_rcnn_cls": out_s["rcnn_loss_cls"],
        "loss_rcnn_box": out_s["rcnn_loss_bbox"],
        "dloss_s_p": dloss_s_p, "dloss_t_p": dloss_t_p,
        "dloss_s_style": dloss_s_style, "dloss_t_style": dloss_t_style,
        "fg_cnt": out_s["fg_cnt"],
    }

    if cr:
        # consistency regularizer [trainval...:299-312]: per-roi spatial mean
        # of D_inst vs the (detached) per-image style probability
        def cst(d_inst, d_style):
            per_roi = jnp.mean(d_inst, axis=(1, 2, 3))          # (B*R,)
            n_rep = per_roi.shape[0] // d_style.shape[0]
            prob = jnp.repeat(d_style.reshape(-1), n_rep)
            return jnp.mean((per_roi - jax.lax.stop_gradient(prob)) ** 2)
        cst_s = cst(out_s["d_instance"], out_s["d_style"])
        cst_t = cst(out_t["d_instance"], out_t["d_style"])
        loss = loss + cst_s + cst_t
        metrics["loss_s_cst"] = cst_s
        metrics["loss_t_cst"] = cst_t

    metrics["loss"] = loss
    return loss, metrics


def make_train_step(model, tx, *, eta: float, eta_style: float,
                    style_lambda: float, cr: bool):
    """Build the jitted train step: (state, batch_s, batch_t, key) ->
    (state, metrics)."""

    @jax.jit
    def train_step(state: TrainState, batch_s: Dict, batch_t: Dict, key):
        k1, k2, k3 = jax.random.split(key, 3)
        rngs = {"sampling": k1, "sampling2": k2, "dropout": k3}
        (_, metrics), grads = jax.value_and_grad(
            det_da_loss, has_aux=True)(
                state.params, model, batch_s, batch_t, rngs,
                eta=eta, eta_style=eta_style, style_lambda=style_lambda,
                cr=cr)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
