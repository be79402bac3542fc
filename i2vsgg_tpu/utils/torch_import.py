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
    """Load a .pth file into a flat {name: np.ndarray} dict (host-side).

    Handles the reference's checkpoint dict wrapper ({"model": state_dict},
    trainval_net_instance_styleD_bilinear.py:421-434) and strips the
    ``module.`` prefix of nn.DataParallel-saved state dicts.
    """
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        if not (hasattr(v, "detach") or isinstance(v, np.ndarray)):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _t(v)
    return out


# ---------------------------------------------------------------------------
# jwyang faster-rcnn.pytorch layout (what the reference's own checkpoints
# use): RCNN_base = Sequential(conv1, bn1, relu, maxpool, layer1..layer3)
# so trunk tensors are RCNN_base.{0,1,4,5,6}.*; RCNN_top.0 = layer4;
# RCNN_rpn.RPN_{Conv,cls_score,bbox_pred}; RCNN_{cls_score,bbox_pred};
# netD_pixel.conv{1,2,3}; netD_style.{fc_1,fc_2,fc1}; SGG stage: vrd.*
# [resnet_instance_styleD_bilinear.py:368-379, resnet_SGG_emb.py:64-130]
# ---------------------------------------------------------------------------

def _linear(sd: Mapping, prefix: str) -> Dict[str, Array]:
    return {"kernel": dense_kernel(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, Array]:
    p = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def jwyang_trunk_params(sd: Mapping, depth: int = 101,
                        prefix: str = "RCNN_base") -> Dict:
    """``RCNN_base.*`` tensors -> ResNetTrunk params."""
    from i2vsgg_tpu.models.backbones import RESNET_STAGES
    n1, n2, n3, _ = RESNET_STAGES[depth]
    return {
        "conv1": {"kernel": conv_kernel(sd[f"{prefix}.0.weight"])},
        "bn1": _bn(sd, f"{prefix}.1"),
        "layer1": _stage(sd, f"{prefix}.4", n1),
        "layer2": _stage(sd, f"{prefix}.5", n2),
        "layer3": _stage(sd, f"{prefix}.6", n3),
    }


def jwyang_detector_params(sd: Mapping, depth: int = 101) -> Dict:
    """Full jwyang/styleD detector state dict -> FasterRCNN_DA param tree.

    Subtrees absent from the checkpoint (e.g. discriminators in a plain
    COCO-pretrained jwyang checkpoint) are simply omitted — merge the result
    over freshly-initialized params with ``merge_imported``.
    """
    from i2vsgg_tpu.models.backbones import RESNET_STAGES
    _, _, _, n4 = RESNET_STAGES[depth]
    out: Dict = {}
    if "RCNN_base.0.weight" in sd:
        out["trunk"] = jwyang_trunk_params(sd, depth)
    if "RCNN_top.0.0.conv1.weight" in sd:
        out["head"] = {"layer4": _stage(sd, "RCNN_top.0", n4)}
    if "RCNN_rpn.RPN_Conv.weight" in sd:
        out["rpn"] = {
            "conv": _conv(sd, "RCNN_rpn.RPN_Conv"),
            "cls_score": _conv(sd, "RCNN_rpn.RPN_cls_score"),
            "bbox_pred": _conv(sd, "RCNN_rpn.RPN_bbox_pred"),
        }
    if "RCNN_cls_score.weight" in sd:
        out["cls_score"] = _linear(sd, "RCNN_cls_score")
    if "RCNN_bbox_pred.weight" in sd:
        out["bbox_pred"] = _linear(sd, "RCNN_bbox_pred")
    if "netD_pixel.conv1.weight" in sd:
        out["netD_pixel"] = {
            f"conv{i}": _conv(sd, f"netD_pixel.conv{i}") for i in (1, 2, 3)}
    if "netD_style.fc_1.weight" in sd:
        out["netD_style"] = {
            "fc_1": _linear(sd, "netD_style.fc_1"),
            "fc_2": _linear(sd, "netD_style.fc_2"),
            "fc1": _linear(sd, "netD_style.fc1"),
        }
    return out


def _fc_chw_to_hwc(w: Array, c: int, h: int, wdt: int) -> Array:
    """torch FC over CHW-flattened pooled features -> our HWC flatten.
    w: (out, c*h*w) -> (h*w*c, out)."""
    o = w.shape[0]
    return (w.reshape(o, c, h, wdt).transpose(0, 2, 3, 1)
            .reshape(o, h * wdt * c).transpose(1, 0))


def jwyang_vrd_params(sd: Mapping, fmap_channels: int = 1024,
                      pool: int = 7) -> Dict:
    """``vrd.*`` tensors (resnet_SGG_emb.py FC/Conv2d wrappers) -> VRDHead
    param subtree. fc6 input is permuted CHW->HWC flatten order."""
    w6 = _t(sd["vrd.fc6.fc.weight"])
    out = {
        "fc6": {"kernel": _fc_chw_to_hwc(w6, fmap_channels, pool, pool),
                "bias": _t(sd["vrd.fc6.fc.bias"])},
        "fc7": _linear(sd, "vrd.fc7.fc"),
        "so_vis_embeddings": _linear(sd, "vrd.so_vis_embeddings.fc"),
        "fc8": _linear(sd, "vrd.fc8.fc"),
        "fc_lov": _linear(sd, "vrd.fc_lov.fc"),
        "fc_fusion": _linear(sd, "vrd.fc_fusion.fc"),
        "fc_rel": _linear(sd, "vrd.fc_rel.fc"),
        "prd_sem_embeddings": {
            "fc0": _linear(sd, "vrd.prd_sem_embeddings.0"),
            "fc1": _linear(sd, "vrd.prd_sem_embeddings.2"),
        },
    }
    if "vrd.fc_so.fc.weight" in sd:
        out["fc_so"] = _linear(sd, "vrd.fc_so.fc")
    for i in range(3):
        key = f"vrd.conv_lo.{i}.conv.weight"
        if key in sd:
            out[f"conv_lo{i}"] = _conv(sd, f"vrd.conv_lo.{i}.conv")
    return out


def jwyang_sgg_params(sd: Mapping, depth: int = 101) -> Dict:
    """Stage-B (SGG) jwyang checkpoint -> SGGModel param tree
    (trunk + vrd head)."""
    out: Dict = {}
    if "RCNN_base.0.weight" in sd:
        out["trunk"] = jwyang_trunk_params(sd, depth)
    if "vrd.fc6.fc.weight" in sd:
        out["vrd"] = jwyang_vrd_params(sd)
    return out


def merge_imported(init_params, imported) -> Dict:
    """Deep-merge imported tensors over freshly-initialized params with
    strict shape checking (unlike the test-time intersection load, a shape
    mismatch here is an import bug and raises)."""
    import jax

    def merge(init, imp, path):
        if isinstance(imp, Mapping):
            out = dict(init)
            for k, v in imp.items():
                if k not in init:
                    raise KeyError(f"imported {'.'.join(path + (k,))} has no "
                                   f"target param (have {sorted(init)})")
                out[k] = merge(init[k], v, path + (k,))
            return out
        got, want = np.asarray(imp), np.asarray(init)
        if got.shape != want.shape:
            raise ValueError(f"shape mismatch at {'.'.join(path)}: "
                             f"imported {got.shape} vs param {want.shape}")
        return got.astype(want.dtype) if want.dtype != got.dtype else got

    return merge(init_params, imported, ())
