"""Init-distribution parity with the reference's explicit head inits
(faster_rcnn_instance_styleD_bilinear.py:195-211,
resnet_instance_styleD_bilinear.py:52-64,104-118, torch Linear defaults for
the vrd head)."""

import numpy as np

import jax
import jax.numpy as jnp

from i2vsgg_tpu.config import Config
from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
from i2vsgg_tpu.models.backbones import ResNetTrunk
from i2vsgg_tpu.models.sgg import SGGModel, VRDHead

TINY = Config().replace(
    TRAIN=Config().TRAIN.__class__(
        RPN_PRE_NMS_TOP_N=100, RPN_POST_NMS_TOP_N=16,
        RPN_POST_NMS_TOP_N_TARGET=8, RPN_BATCHSIZE=16, BATCH_SIZE=8,
        MAX_NUM_GT_BOXES=4),
    TEST=Config().TEST.__class__(RPN_PRE_NMS_TOP_N=100, RPN_POST_NMS_TOP_N=16),
    COMPUTE_DTYPE="float32",
)


def _std(x):
    return float(np.std(np.asarray(x, np.float64)))


def test_detector_head_init_distributions():
    model = FasterRCNN_DA(num_classes=6, cfg=TINY, backbone="res10",
                          ic=True, gc=True)
    # the fused inference path skips netD conv3 — take the full
    # discriminator subtree from a target-mode init (same PRNG key)
    params = dict(model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 80, 3)), jnp.asarray([[64, 80, 1.0]]),
        mode="inference")["params"])
    params["netD_pixel"] = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 80, 3)), jnp.asarray([[64, 80, 1.0]]),
        mode="target")["params"]["netD_pixel"]

    # RPN conv/cls/bbox: normal(0, 0.01), zero bias
    for name in ("conv", "cls_score", "bbox_pred"):
        k = params["rpn"][name]["kernel"]
        assert abs(_std(k) - 0.01) < 0.002, (name, _std(k))
        np.testing.assert_array_equal(np.asarray(params["rpn"][name]["bias"]),
                                      0.0)
    # RCNN heads: normal(0, 0.01) / normal(0, 0.001)
    assert abs(_std(params["cls_score"]["kernel"]) - 0.01) < 0.002
    assert abs(_std(params["bbox_pred"]["kernel"]) - 0.001) < 0.0002

    # netD_pixel convs: normal(0, 0.01)
    for name in ("conv1", "conv2", "conv3"):
        k = params["netD_pixel"][name]["kernel"]
        assert abs(_std(k) - 0.01) < 0.003, (name, _std(k))

    # netD_style FCs: kaiming fan_out (std = sqrt(2 / fan_out)); biases
    # torch-default uniform(+-1/sqrt(fan_in)) — nonzero
    for name in ("fc_1", "fc_2", "fc1"):
        k = params["netD_style"][name]["kernel"]
        fan_out = k.shape[-1]
        want = (2.0 / fan_out) ** 0.5
        assert abs(_std(k) - want) / want < 0.25, (name, _std(k), want)
        b = np.asarray(params["netD_style"][name]["bias"])
        fan_in = k.shape[0]
        bound = 1.0 / fan_in ** 0.5
        assert np.abs(b).max() <= bound + 1e-7
        if b.size >= 64:
            assert np.abs(b).max() > 0.0


def test_vrd_head_torch_default_inits():
    model = SGGModel(trunk=ResNetTrunk(depth=10, dtype=jnp.float32),
                     vrd=VRDHead(emb_dim=32, fc_dim=64, dtype=jnp.float32),
                     n_rel=5)
    g, p = 4, 6
    prd = jnp.zeros((5, 300))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 80, 3)), jnp.asarray([64, 80, 1.0]),
        jnp.zeros((g, 4)), jnp.zeros((g,), jnp.int32),
        jnp.zeros((p,), jnp.int32), jnp.zeros((p,), jnp.int32),
        jnp.zeros((p,), bool), prd)["params"]

    vrd = params["vrd"]
    for name in ("fc6", "fc7", "fc8", "fc_so", "fc_fusion", "fc_rel",
                 "so_vis_embeddings", "fc_lov"):
        k = np.asarray(vrd[name]["kernel"], np.float64)
        fan_in = k.shape[0]
        bound = 1.0 / fan_in ** 0.5
        # uniform(+-1/sqrt(fan_in)): bounded, std ~ bound/sqrt(3)
        assert np.abs(k).max() <= bound + 1e-7, name
        want = bound / 3 ** 0.5
        assert abs(k.std() - want) / want < 0.2, (name, k.std(), want)
        b = np.asarray(vrd[name]["bias"])
        assert np.abs(b).max() <= bound + 1e-7, name
    # conv tower: fan_in includes the receptive field
    k = np.asarray(vrd["conv_lo1"]["kernel"], np.float64)  # (5,5,96,128)
    fan_in = 5 * 5 * 96
    bound = 1.0 / fan_in ** 0.5
    assert np.abs(k).max() <= bound + 1e-7
    assert abs(k.std() - bound / 3 ** 0.5) / (bound / 3 ** 0.5) < 0.1
