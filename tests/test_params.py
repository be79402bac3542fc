"""bf16 serving-weight cast: precision-sensitive paths stay fp32."""

import numpy as np

import jax.numpy as jnp

from i2vsgg_tpu.utils.params import bf16_storage_cast


def test_bf16_cast_excludes_bn_and_bbox():
    tree = {
        "trunk": {"conv1": {"kernel": jnp.ones((3, 3, 3, 8), jnp.float32)},
                  "layer2": {"block0": {
                      "bn1": {"scale": jnp.ones(4), "var": jnp.ones(4),
                              "mean": jnp.zeros(4), "bias": jnp.zeros(4)},
                      "downsample_bn": {"scale": jnp.ones(4)},
                      "conv2": {"kernel": jnp.ones((3, 3, 4, 4))}}}},
        "bbox_pred": {"kernel": jnp.ones((8, 4)), "bias": jnp.zeros(4)},
        "cls_score": {"kernel": jnp.ones((8, 4))},
        "step": jnp.zeros((), jnp.int32),
    }
    out = bf16_storage_cast(tree)
    # cast: conv kernels, cls head
    assert out["trunk"]["conv1"]["kernel"].dtype == jnp.bfloat16
    assert out["trunk"]["layer2"]["block0"]["conv2"]["kernel"].dtype == \
        jnp.bfloat16
    assert out["cls_score"]["kernel"].dtype == jnp.bfloat16
    # kept fp32: FrozenBatchNorm stats (bn* and *_bn), bbox regression
    bn = out["trunk"]["layer2"]["block0"]["bn1"]
    assert all(v.dtype == jnp.float32 for v in bn.values())
    assert out["trunk"]["layer2"]["block0"]["downsample_bn"][
        "scale"].dtype == jnp.float32
    assert out["bbox_pred"]["kernel"].dtype == jnp.float32
    assert out["bbox_pred"]["bias"].dtype == jnp.float32
    # non-fp32 leaves untouched
    assert out["step"].dtype == jnp.int32
    # values preserved (bf16 round of ones is exact)
    np.testing.assert_array_equal(
        np.asarray(out["trunk"]["conv1"]["kernel"], np.float32), 1.0)
