"""Weight initializers matching the reference's init distributions.

The reference initializes freshly-created heads explicitly
(``faster_rcnn_instance_styleD_bilinear.py:195-211``,
``resnet_instance_styleD_bilinear.py:52-64,104-118``) and leaves the vrd
head's FC/Conv wrappers on torch defaults (``lib/model/faster_rcnn/utils.py``
wraps plain ``nn.Linear``/``nn.Conv2d``). Matching the init DISTRIBUTIONS
matters for quality-parity training runs: distributionally different inits on
fresh adversarial heads shift DA training dynamics.

Flax kernel shapes are (in, out) for Dense and (kh, kw, in, out) for Conv;
``variance_scaling`` computes fan_in/fan_out from those exactly like torch's
``_calculate_fan_in_and_fan_out`` (conv fans include the receptive field).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def normal_init(stddev: float = 0.01):
    """torch ``normal_init(m, 0, stddev)`` (bias zeroed separately — flax's
    default bias init is already zeros)."""
    return nn.initializers.normal(stddev)


def kaiming_fan_out():
    """torch ``kaiming_normal_(w, mode='fan_out', nonlinearity='relu')``:
    normal with std = sqrt(2 / fan_out)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_linear_kernel():
    """torch ``nn.Linear``/``nn.Conv2d`` default weight init:
    kaiming_uniform_(a=sqrt(5)) == uniform(+-1/sqrt(fan_in)), i.e. variance
    1/(3 * fan_in)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias(fan_in: int):
    """torch Linear/Conv default bias init: uniform(+-1/sqrt(fan_in)) with
    the LAYER's fan_in (not derivable from the bias shape, so passed in)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense_t(features: int, fan_in: int, name: str, **kw) -> nn.Dense:
    """``nn.Dense`` with torch-default init (callers pass the input width)."""
    return nn.Dense(features, name=name,
                    kernel_init=torch_linear_kernel(),
                    bias_init=torch_linear_bias(fan_in), **kw)
