"""Numerical parity of the flax backbones vs a PyTorch reference model.

Builds a torch ResNet with the reference's exact architecture (caffe-style
Bottleneck: stride on the first 1x1 conv — resnet_instance_styleD_bilinear.py:186)
with random weights, imports them via utils/torch_import, and checks forward
outputs match in fp32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from i2vsgg_tpu.models.backbones import (  # noqa: E402
    ResNetTrunk, ResNetHead, VGG16Trunk, VGG16Head)
from i2vsgg_tpu.utils import torch_import as ti  # noqa: E402


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=1, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class TorchResNet(tnn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)


@pytest.fixture(scope="module")
def torch_resnet():
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        # tiny ResNet (resnet50-shaped stages truncated) for test speed
        model = TorchResNet(layers=(1, 1, 1, 1)).eval()
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(model, gen)
    return model


TINY_STAGES = (1, 1, 1, 1)


def test_resnet_trunk_parity(torch_resnet):
    import i2vsgg_tpu.models.backbones as bb
    old = bb.RESNET_STAGES.get(101)
    bb.RESNET_STAGES[101] = TINY_STAGES
    try:
        x = torch.randn(1, 3, 64, 96, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            t = torch_resnet
            h = t.maxpool(t.relu(t.bn1(t.conv1(x))))
            h = t.layer1(h)
            tap_t = t.layer2(h)
            out_t = t.layer3(tap_t)

        params = ti.resnet_trunk_params(torch_resnet.state_dict(), 101)
        trunk = ResNetTrunk(depth=101, dtype=jnp.float32)
        out, tap = trunk.apply({"params": params},
                               jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out), out_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-2, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(tap), tap_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-2, atol=2e-3)
    finally:
        bb.RESNET_STAGES[101] = old


def test_resnet_head_parity(torch_resnet):
    import i2vsgg_tpu.models.backbones as bb
    old = bb.RESNET_STAGES.get(101)
    bb.RESNET_STAGES[101] = TINY_STAGES
    try:
        x = torch.randn(5, 1024, 7, 7, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            out_t = torch_resnet.layer4(x).mean(3).mean(2)
        params = ti.resnet_head_params(torch_resnet.state_dict(), 101)
        head = ResNetHead(depth=101, dtype=jnp.float32)
        out = head.apply({"params": params},
                         jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                                   rtol=1e-2, atol=2e-3)
    finally:
        bb.RESNET_STAGES[101] = old


def test_vgg16_parity():
    gen = torch.Generator().manual_seed(3)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.ReLU(inplace=True)]
            in_c = v
    features = tnn.Sequential(*layers)
    classifier = tnn.Sequential(
        tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
        tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout())
    model = tnn.Sequential()
    model.add_module("features", features)
    model.add_module("classifier", classifier)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    model.eval()

    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        # trunk = features without the final maxpool (stride 16)
        feat_t = tnn.Sequential(*list(features.children())[:-1])(x)

    params = ti.vgg16_trunk_params(model.state_dict())
    trunk = VGG16Trunk(dtype=jnp.float32)
    out, tap = trunk.apply({"params": params},
                           jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               feat_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-2, atol=2e-3)
    assert tap.shape == (1, 8, 8, 512)

    # head parity on pooled features
    pooled = torch.randn(4, 512, 7, 7, generator=gen)
    with torch.no_grad():
        out_t = classifier[:2](pooled.flatten(1))  # fc6+relu
        out_t = classifier[3:5](out_t)             # fc7+relu
    hparams = ti.vgg16_head_params(model.state_dict())
    head = VGG16Head(dtype=jnp.float32)
    out_h = head.apply({"params": hparams},
                       jnp.asarray(pooled.numpy().transpose(0, 2, 3, 1)),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(out_h), out_t.numpy(),
                               rtol=1e-2, atol=2e-3)


def test_conv1_s2d_equals_direct_conv(rng, monkeypatch):
    """Space-to-depth conv1 must compute the identical function to the
    direct 7x7/s2 conv (even and odd input sizes)."""
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.models.backbones import Conv1S2D

    monkeypatch.setenv("I2VSGG_S2D", "1")

    m = Conv1S2D(dtype=jnp.float32)
    for h, w in ((64, 96), (60, 80)):
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        kern = params["params"]["kernel"]
        ref = jax.lax.conv_general_dilated(
            x, kern, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert out.shape == ref.shape, (h, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=f"{h}x{w}")
