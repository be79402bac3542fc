"""Frozen configuration tree.

Replaces the reference's mutable global ``easydict`` singleton
(``lib/model/utils/config.py:11-407``) with an immutable dataclass tree that
is threaded explicitly through the code. Field names preserve the reference's
config keys (``TRAIN.RPN_PRE_NMS_TOP_N`` etc.) so YAML configs written for the
reference (``cfgs/res101.yml``) load unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence, Tuple

import yaml


def _freplace(obj, **kw):
    return dataclasses.replace(obj, **kw)


@dataclass(frozen=True)
class TrainConfig:
    # Reference defaults: lib/model/utils/config.py:40-160
    SCALES: Tuple[int, ...] = (600,)
    MAX_SIZE: int = 1000
    TRUNCATED: bool = False
    # RoI minibatch sampling (proposal-target layer)
    BATCH_SIZE: int = 128            # rois per image
    FG_FRACTION: float = 0.25
    FG_THRESH: float = 0.5
    BG_THRESH_HI: float = 0.5
    BG_THRESH_LO: float = 0.1
    USE_FLIPPED: bool = True
    BBOX_REG: bool = True
    BBOX_THRESH: float = 0.5
    BBOX_NORMALIZE_TARGETS: bool = True
    BBOX_INSIDE_WEIGHTS: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    BBOX_NORMALIZE_TARGETS_PRECOMPUTED: bool = True
    BBOX_NORMALIZE_MEANS: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    BBOX_NORMALIZE_STDS: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # RPN anchor-target assignment
    RPN_POSITIVE_OVERLAP: float = 0.7
    RPN_NEGATIVE_OVERLAP: float = 0.3
    RPN_CLOBBER_POSITIVES: bool = False
    RPN_FG_FRACTION: float = 0.5
    RPN_BATCHSIZE: int = 256
    RPN_NMS_THRESH: float = 0.7
    RPN_PRE_NMS_TOP_N: int = 12000
    RPN_POST_NMS_TOP_N: int = 2000
    RPN_POST_NMS_TOP_N_TARGET: int = 128   # target-domain batches cap
    RPN_MIN_SIZE: int = 8
    RPN_BBOX_INSIDE_WEIGHTS: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    RPN_POSITIVE_WEIGHT: float = -1.0
    # Optimization
    LEARNING_RATE: float = 0.001
    MOMENTUM: float = 0.9
    WEIGHT_DECAY: float = 0.0005
    GAMMA: float = 0.1
    DOUBLE_BIAS: bool = True
    BIAS_DECAY: bool = False
    # Static-shape padding (replaces the reference's MAX_NUM_GT_BOXES
    # roibatchLoader padding, lib/roi_data_layer/roibatchLoader.py:199-203)
    MAX_NUM_GT_BOXES: int = 30


@dataclass(frozen=True)
class TestConfig:
    # Reference defaults: lib/model/utils/config.py:165-210
    SCALES: Tuple[int, ...] = (600,)
    MAX_SIZE: int = 1000
    NMS: float = 0.3
    BBOX_REG: bool = True
    RPN_NMS_THRESH: float = 0.7
    RPN_PRE_NMS_TOP_N: int = 6000
    RPN_POST_NMS_TOP_N: int = 300
    RPN_MIN_SIZE: int = 16
    RPN_TOP_N: int = 5000
    MAX_DETECTIONS_PER_IMAGE: int = 100   # top-100 cap in test drivers
    # per-class NMS keep cap in the on-device decode (serve.py). 0 = tie to
    # MAX_DETECTIONS_PER_IMAGE (the reference keeps every survivor per
    # class, then applies only the image-level cap — a static per-class
    # bound >= the image cap is behaviorally identical). A smaller value is
    # a SERVING capacity cut; gate it with tools/capacity_ab.py rows.
    MAX_PER_CLASS: int = 0


@dataclass(frozen=True)
class ResNetConfig:
    FIXED_BLOCKS: int = 1
    MAX_POOL: bool = False


@dataclass(frozen=True)
class Config:
    """Top-level config. Mirrors the reference's global ``cfg``."""

    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    RESNET: ResNetConfig = field(default_factory=ResNetConfig)
    # Caffe-convention BGR pixel means (lib/model/utils/config.py:264)
    PIXEL_MEANS: Tuple[float, ...] = (102.9801, 115.9465, 122.7717)
    RNG_SEED: int = 3
    POOLING_MODE: str = "align"
    POOLING_SIZE: int = 7
    ANCHOR_SCALES: Tuple[int, ...] = (8, 16, 32)
    ANCHOR_RATIOS: Tuple[float, ...] = (0.5, 1.0, 2.0)
    FEAT_STRIDE: Tuple[int, ...] = (16,)
    CROP_RESIZE_WITH_MAX_POOL: bool = True
    EPS: float = 1e-14
    # TPU-specific knobs (new in this framework)
    COMPUTE_DTYPE: str = "bfloat16"   # backbone compute dtype
    PARAM_DTYPE: str = "float32"

    @property
    def num_anchors(self) -> int:
        return len(self.ANCHOR_SCALES) * len(self.ANCHOR_RATIOS)

    def replace(self, **kw) -> "Config":
        return _freplace(self, **kw)


# Reference config keys with no equivalent here (GPU/caffe/snapshot knobs,
# dead options); silently skipped when loading reference YAMLs so
# ``cfgs/*.yml`` written for the PyTorch tree load unchanged.
LEGACY_KEYS = frozenset({
    "HAS_RPN", "IMS_PER_BATCH", "PROPOSAL_METHOD", "DISPLAY",
    "SNAPSHOT_PREFIX", "SNAPSHOT_ITERS", "SNAPSHOT_KEPT", "EXP_DIR",
    "USE_GPU_NMS", "GPU_ID", "DATA_DIR", "ROOT_DIR", "MATLAB", "USE_FLIPPED",
    "ASPECT_GROUPING", "SUMMARY_INTERVAL", "TRIM_HEIGHT", "TRIM_WIDTH",
    "USE_ALL_GT", "PRETRAIN_PATH", "RESNET_PATH", "VGG_PATH", "DEDUP_BOXES",
    "PROPOSAL_LIMIT", "MODE", "SVM", "BBOX_VOTE", "AGNOSTIC",
})


def _merge_into(dc, src: Mapping[str, Any], strict: bool = True):
    """Recursively merge a dict into a frozen dataclass, returning a copy."""
    kw = {}
    names = {f.name: f for f in dataclasses.fields(dc)}
    for key, value in src.items():
        if key not in names:
            if not strict or key in LEGACY_KEYS:
                continue
            raise KeyError(f"Unknown config key: {key!r} for {type(dc).__name__}")
        cur = getattr(dc, key)
        if dataclasses.is_dataclass(cur) and isinstance(value, Mapping):
            kw[key] = _merge_into(cur, value)
        else:
            if isinstance(cur, tuple) and isinstance(value, (list, tuple)):
                value = tuple(value)
            elif cur is not None and not isinstance(value, type(cur)):
                # mirror the reference's type coercion (config.py:322-341)
                if isinstance(cur, float) and isinstance(value, int):
                    value = float(value)
                elif isinstance(cur, bool) and isinstance(value, int):
                    value = bool(value)
                else:
                    raise ValueError(
                        f"Type mismatch for {key}: {type(value)} vs {type(cur)}")
            kw[key] = value
    return _freplace(dc, **kw)


def cfg_from_file(path: str, base: Config | None = None) -> Config:
    """Load YAML config (reference ``cfgs/*.yml`` format) over defaults."""
    base = base or Config()
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    # Reference YAMLs carry keys we deliberately drop (paths, GPU knobs).
    data = {k: v for k, v in data.items()
            if k in {f.name for f in dataclasses.fields(Config)}}
    return _merge_into(base, data)


def cfg_from_list(pairs: Sequence[str], base: Config | None = None) -> Config:
    """Apply ``["TRAIN.RPN_PRE_NMS_TOP_N", "6000", ...]`` style overrides
    (reference ``cfg_from_list``, config.py:386-407)."""
    base = base or Config()
    assert len(pairs) % 2 == 0, "set_cfgs must be key/value pairs"
    cfg = base
    for key, raw in zip(pairs[0::2], pairs[1::2]):
        parts = key.split(".")
        tree: dict = {}
        node = tree
        for p in parts[:-1]:
            node[p] = {}
            node = node[p]
        node[parts[-1]] = yaml.safe_load(raw)
        cfg = _merge_into(cfg, tree)
    return cfg
