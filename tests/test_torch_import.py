"""Weight-import parity: a hand-built torch ResNet trunk (caffe stride
placement, frozen eval-mode BN — the reference's backbone semantics) must
produce the same features as ResNetTrunk with converted params.

This is SURVEY.md §7 hard part 2 (caffe-weight parity) as a test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from i2vsgg_tpu.models.backbones import ResNetTrunk, RESNET_STAGES
from i2vsgg_tpu.utils.torch_import import (resnet_trunk_params,
                                           vgg16_head_params, dense_kernel)


class TorchBottleneck(tnn.Module):
    """Caffe-style bottleneck: stride on the FIRST 1x1 conv (the reference's
    converted-weights convention, resnet_instance_styleD_bilinear.py)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


def build_torch_trunk(depth):
    n1, n2, n3, _ = RESNET_STAGES[depth]

    def stage(inp, planes, blocks, stride):
        layers = [TorchBottleneck(inp, planes, stride, downsample=True)]
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(planes * 4, planes))
        return tnn.Sequential(*layers)

    m = tnn.Module()
    m.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
    m.bn1 = tnn.BatchNorm2d(64)
    m.relu = tnn.ReLU()
    # caffe convention (the reference's '# change'): pad 0, ceil mode
    m.maxpool = tnn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
    m.layer1 = stage(64, 64, n1, 1)
    m.layer2 = stage(256, 128, n2, 2)
    m.layer3 = stage(512, 256, n3, 2)

    def forward(x):
        x = m.maxpool(m.relu(m.bn1(m.conv1(x))))
        x = m.layer1(x)
        tap = m.layer2(x)
        return m.layer3(tap), tap

    m.fwd = forward
    return m


def test_resnet_trunk_import_value_parity(rng):
    depth = 10
    tm = build_torch_trunk(depth)
    # randomize BN stats so frozen-BN conversion is actually exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.3)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * 2 + 0.5)
                mod.weight.copy_(torch.randn_like(mod.weight) * 0.2 + 1.0)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)
    tm.eval()

    x = rng.randn(1, 3, 64, 80).astype(np.float32)
    with torch.no_grad():
        ref_feat, ref_tap = tm.fwd(torch.from_numpy(x))
    ref_feat = ref_feat.numpy().transpose(0, 2, 3, 1)
    ref_tap = ref_tap.numpy().transpose(0, 2, 3, 1)

    params = resnet_trunk_params(tm.state_dict(), depth)
    trunk = ResNetTrunk(depth=depth, dtype=jnp.float32)
    feat, tap = trunk.apply({"params": params},
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(tap), ref_tap, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat), ref_feat, atol=2e-4)


def test_vgg16_head_flatten_permutation(rng):
    """fc6's CHW->HWC input permutation must preserve the linear map."""
    w = rng.randn(4096, 512 * 7 * 7).astype(np.float32)
    b = rng.randn(4096).astype(np.float32)
    sd = {"classifier.0.weight": torch.from_numpy(w),
          "classifier.0.bias": torch.from_numpy(b),
          "classifier.3.weight": torch.zeros(4096, 4096),
          "classifier.3.bias": torch.zeros(4096)}
    params = vgg16_head_params(sd)
    feat_chw = rng.randn(2, 512, 7, 7).astype(np.float32)
    ref = feat_chw.reshape(2, -1) @ w.T + b
    feat_hwc = feat_chw.transpose(0, 2, 3, 1).reshape(2, -1)
    got = feat_hwc @ params["fc6"]["kernel"] + params["fc6"]["bias"]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_resnet_head_import_value_parity(rng):
    """layer4 (ResNetHead) conversion parity incl. the spatial mean."""
    from i2vsgg_tpu.models.backbones import ResNetHead
    n4 = RESNET_STAGES[10][3]
    layers = [TorchBottleneck(1024, 512, 2, downsample=True)]
    for _ in range(1, n4):
        layers.append(TorchBottleneck(2048, 512))
    tm = tnn.Module()
    tm.layer4 = tnn.Sequential(*layers)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.2)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
    tm.eval()
    x = rng.randn(4, 1024, 7, 7).astype(np.float32)
    with torch.no_grad():
        ref = tm.layer4(torch.from_numpy(x)).mean(dim=(2, 3)).numpy()
    from i2vsgg_tpu.utils.torch_import import resnet_head_params
    params = resnet_head_params(tm.state_dict(), 10)
    head = ResNetHead(depth=10, dtype=jnp.float32)
    got = head.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)
