"""Import PyTorch checkpoints into i2vsgg_tpu parameter trees.

The reference initializes its backbone from caffe-converted ``.pth`` files
(``cfg.RESNET_PATH``, ``lib/model/utils/config.py:246-248``) with
torchvision-style state-dict names. This module maps those numpy-converted
tensors into our flax param pytrees:

* torch conv weights (O, I, KH, KW) -> flax (KH, KW, I, O)
* torch linear weights (O, I) -> flax (I, O)
* BatchNorm weight/bias/running_mean/running_var -> FrozenBatchNorm
  scale/bias/mean/var

Only numpy arrays cross the boundary — torch is an optional import used at
conversion time on the host, never in the jitted path.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray


def _t(x) -> Array:
    """torch tensor / numpy -> numpy float32."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def conv_kernel(w) -> Array:
    return _t(w).transpose(2, 3, 1, 0)


def dense_kernel(w) -> Array:
    return _t(w).transpose(1, 0)


def _bn(sd: Mapping, prefix: str) -> Dict[str, Array]:
    return {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }


def _bottleneck(sd: Mapping, prefix: str, has_downsample: bool) -> Dict:
    p = {
        "conv1": {"kernel": conv_kernel(sd[f"{prefix}.conv1.weight"])},
        "bn1": _bn(sd, f"{prefix}.bn1"),
        "conv2": {"kernel": conv_kernel(sd[f"{prefix}.conv2.weight"])},
        "bn2": _bn(sd, f"{prefix}.bn2"),
        "conv3": {"kernel": conv_kernel(sd[f"{prefix}.conv3.weight"])},
        "bn3": _bn(sd, f"{prefix}.bn3"),
    }
    if has_downsample:
        p["downsample_conv"] = {
            "kernel": conv_kernel(sd[f"{prefix}.downsample.0.weight"])}
        p["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return p


def _stage(sd: Mapping, prefix: str, blocks: int) -> Dict:
    out = {}
    for i in range(blocks):
        out[f"block{i}"] = _bottleneck(sd, f"{prefix}.{i}",
                                       has_downsample=(i == 0))
    return out


def resnet_trunk_params(sd: Mapping, depth: int = 101) -> Dict:
    """State dict -> ResNetTrunk params (conv1..layer3)."""
    from i2vsgg_tpu.models.backbones import RESNET_STAGES
    n1, n2, n3, _ = RESNET_STAGES[depth]
    return {
        "conv1": {"kernel": conv_kernel(sd["conv1.weight"])},
        "bn1": _bn(sd, "bn1"),
        "layer1": _stage(sd, "layer1", n1),
        "layer2": _stage(sd, "layer2", n2),
        "layer3": _stage(sd, "layer3", n3),
    }


def resnet_head_params(sd: Mapping, depth: int = 101) -> Dict:
    from i2vsgg_tpu.models.backbones import RESNET_STAGES
    _, _, _, n4 = RESNET_STAGES[depth]
    return {"layer4": _stage(sd, "layer4", n4)}


def vgg16_trunk_params(sd: Mapping) -> Dict:
    """torchvision-style ``features.N`` VGG16 state dict -> VGG16Trunk params.
    Indices of conv layers inside torchvision vgg16.features."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, idx in enumerate(conv_idx):
        out[f"conv{i}"] = {
            "kernel": conv_kernel(sd[f"features.{idx}.weight"]),
            "bias": _t(sd[f"features.{idx}.bias"]),
        }
    return out


def vgg16_head_params(sd: Mapping) -> Dict:
    """classifier.0 / classifier.3 -> fc6 / fc7.

    NOTE: torch flattens (C, H, W) while we flatten NHWC (H, W, C); the fc6
    kernel's input dim is permuted accordingly.
    """
    w6 = _t(sd["classifier.0.weight"])          # (4096, 512*7*7) in CHW order
    w6 = (w6.reshape(4096, 512, 7, 7).transpose(0, 2, 3, 1)
          .reshape(4096, 7 * 7 * 512).transpose(1, 0))
    return {
        "fc6": {"kernel": w6, "bias": _t(sd["classifier.0.bias"])},
        "fc7": {"kernel": dense_kernel(sd["classifier.3.weight"]),
                "bias": _t(sd["classifier.3.bias"])},
    }


def load_torch_checkpoint(path: str) -> Dict[str, Array]:
    """Load a .pth file into a flat {name: np.ndarray} dict (host-side)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return {k: _t(v) for k, v in sd.items() if hasattr(v, "detach") or
            isinstance(v, np.ndarray)}
