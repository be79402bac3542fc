"""bf16 serving-weight cast: precision-sensitive paths stay fp32."""

import numpy as np
import pytest

import jax.numpy as jnp

from i2vsgg_tpu.utils.params import (bf16_storage_cast,
                                     quantize_trunk_params)


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


def _trunk_tree():
    return {"trunk": {
        "layer3": {"block0": {
            "conv2": {"kernel": jnp.ones((3, 3, 8, 8), jnp.float32)},
            "conv1": {"kernel": jnp.ones((1, 1, 8, 8), jnp.float32)}}},
        "layer4": {"block0": {
            "conv1": {"kernel": jnp.ones((1, 1, 8, 8), jnp.float32)},
            "conv2": {"kernel": jnp.ones((3, 3, 8, 8), jnp.float32)}}},
    }}


def test_quantize_trunk_static_acts_dict_and_k3_filter():
    """Static act scales attach per calibrated path; the '@3x3' token
    keeps 1x1 kernels fp (int8 1x1 convs measured slower than bf16 —
    PERF.md round 4), so only 3x3 paths need calibration entries."""
    acts = {"trunk/layer3/block0/conv2": 0.5,
            "trunk/layer4/block0/conv2": 0.25}
    out = quantize_trunk_params(_trunk_tree(), "layer3,layer4,@3x3", acts)
    c2 = out["trunk"]["layer3"]["block0"]["conv2"]
    assert c2["kernel"].dtype == jnp.int8 and "kernel_scale" in c2
    assert float(c2["act_scale"]) == 0.5
    # 1x1s out of @3x3 scope: untouched, no act_scale demanded
    c1 = out["trunk"]["layer3"]["block0"]["conv1"]
    assert c1["kernel"].dtype == jnp.float32 and "act_scale" not in c1


def test_quantize_trunk_static_acts_missing_path_raises():
    """A calibration dict that doesn't cover an in-scope conv must fail
    loudly (bench.py catches this and falls back to unit scales when the
    calibration model's paths don't map, e.g. res50 scales on res101)."""
    with pytest.raises(KeyError):
        quantize_trunk_params(_trunk_tree(), "layer3,@3x3",
                              {"wrong/path": 0.1})


def test_quantize_trunk_scalar_acts_covers_every_in_scope_conv():
    out = quantize_trunk_params(_trunk_tree(), "layer3,layer4,@3x3", 1.0)
    for layer in ("layer3", "layer4"):
        c2 = out["trunk"][layer]["block0"]["conv2"]
        assert c2["kernel"].dtype == jnp.int8
        assert float(c2["act_scale"]) == 1.0
