"""Optimizer construction with the reference's parameter-group semantics.

Reproduces ``trainval_net_instance_styleD_bilinear.py:134-148``:

* SGD + momentum 0.9 (torch-style: buf = mu*buf + g; update = -lr*buf)
* weight decay on non-bias params only (BIAS_DECAY=False)
* bias params get 2x learning rate (DOUBLE_BIAS=True)
* frozen params (conv1/bn1; all FrozenBN affines are stop-gradient'ed
  already) receive zero updates.

Built as optax transforms so the whole update runs inside the jitted train
step on device.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax

from i2vsgg_tpu.config import Config


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def make_label_fn(frozen_prefixes: Sequence[str]):
    """Label each param: 'frozen' | 'bias' | 'weight'."""
    def label(params):
        def one(path, _):
            s = _path_str(path)
            for p in frozen_prefixes:
                if s.startswith(p):
                    return "frozen"
            # All FrozenBatchNorm affines/statistics are frozen (reference
            # set_bn_fix, resnet_instance_styleD_bilinear.py:392-411).
            # Gradients are already stop_gradient'ed in the module, but
            # weight decay would still mutate them unless masked here.
            segs = s.split("/")
            if any(seg.startswith("bn") or seg.endswith("_bn")
                   for seg in segs[:-1]):
                return "frozen"
            leaf = segs[-1]
            return "bias" if leaf == "bias" else "weight"
        return jax.tree_util.tree_map_with_path(one, params)
    return label


def sgd_reference(lr_schedule: Callable[[int], float] | float,
                  cfg: Config,
                  frozen_prefixes: Sequence[str] = ("trunk/conv1",
                                                    "trunk/bn1"),
                  clip_norm: float = 0.0):
    """Reference-parity SGD. ``lr_schedule`` maps step -> lr.

    ``clip_norm`` > 0 adds global-norm gradient clipping — the reference
    clips at 10 for the VGG16 backbone (``clip_gradient``,
    ``net_utils.py:28-36``, applied in the train drivers for vgg16).
    """
    t = cfg.TRAIN
    if not callable(lr_schedule):
        base = float(lr_schedule)
        lr_schedule = lambda step: base  # noqa: E731

    def group(double_lr: bool, decay: bool):
        chain = []
        if decay and t.WEIGHT_DECAY:
            chain.append(optax.add_decayed_weights(t.WEIGHT_DECAY))
        chain.append(optax.trace(decay=t.MOMENTUM))
        mult = 2.0 if (double_lr and t.DOUBLE_BIAS) else 1.0
        chain.append(optax.scale_by_schedule(
            lambda step: -mult * lr_schedule(step)))
        return optax.chain(*chain)

    label_fn = make_label_fn(frozen_prefixes)
    tx = optax.multi_transform(
        {"weight": group(False, True),
         "bias": group(True, bool(t.BIAS_DECAY)),
         "frozen": optax.set_to_zero()},
        label_fn)
    if clip_norm > 0:
        # the reference's clip_gradient computes the global norm over
        # requires_grad params only (net_utils.py:88-99) — frozen layers
        # (conv1/bn1) have no grad there. Zero frozen-labeled grads BEFORE
        # the norm so the clip scale matches; with an inflated norm every
        # clipped step would be systematically smaller than the reference's.
        tx = optax.chain(_zero_labeled(label_fn, "frozen"),
                         optax.clip_by_global_norm(clip_norm), tx)
    return tx


def _zero_labeled(label_fn, which: str):
    """Gradient transform: zero every update whose label == ``which``."""
    import jax.numpy as jnp

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        labels = label_fn(updates)
        out = jax.tree_util.tree_map(
            lambda u, l: jnp.zeros_like(u) if l == which else u,
            updates, labels)
        return out, state

    return optax.GradientTransformation(init, update)


def step_decay_schedule(base_lr: float, decay_step_epochs: int,
                        gamma: float, steps_per_epoch: int):
    """Epoch-boundary step decay: lr *= gamma every ``decay_step_epochs``
    epochs (reference: `:232-234`)."""
    import jax.numpy as jnp

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        n_decays = (epoch // decay_step_epochs).astype(jnp.float32) \
            if hasattr(epoch, "astype") else float(epoch // decay_step_epochs)
        return base_lr * jnp.power(gamma, n_decays)
    return schedule
