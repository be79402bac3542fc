"""Config tree: YAML loading (incl. UNMODIFIED reference cfgs), CLI
overrides, legacy-key tolerance."""

from i2vsgg_tpu.config import Config, cfg_from_file, cfg_from_list


def test_shipped_cfgs_load():
    for name in ("res101", "res50", "vgg16", "res101_ls"):
        cfg = cfg_from_file(f"cfgs/{name}.yml")
        assert cfg.TRAIN.RPN_POSITIVE_OVERLAP == 0.7
    cfg = cfg_from_file("cfgs/res101_ls.yml")
    assert cfg.TRAIN.SCALES == (800,)
    assert cfg.TEST.RPN_POST_NMS_TOP_N == 1000


def test_reference_yaml_loads_unchanged(tmp_path):
    """A YAML written for the PyTorch reference (with its legacy keys)
    must load without modification."""
    y = tmp_path / "ref.yml"
    y.write_text("""EXP_DIR: res101
TRAIN:
  HAS_RPN: True
  IMS_PER_BATCH: 1
  BBOX_NORMALIZE_TARGETS_PRECOMPUTED: True
  RPN_POSITIVE_OVERLAP: 0.7
  RPN_BATCHSIZE: 256
  PROPOSAL_METHOD: gt
  BG_THRESH_LO: 0.0
  DISPLAY: 20
  BATCH_SIZE: 128
TEST:
  HAS_RPN: True
""")
    cfg = cfg_from_file(str(y))
    assert cfg.TRAIN.BATCH_SIZE == 128
    assert cfg.TRAIN.BG_THRESH_LO == 0.0


def test_cfg_from_list_overrides():
    cfg = cfg_from_list(["TRAIN.RPN_PRE_NMS_TOP_N", "6000",
                         "ANCHOR_SCALES", "[4, 8, 16, 32]"])
    assert cfg.TRAIN.RPN_PRE_NMS_TOP_N == 6000
    assert cfg.ANCHOR_SCALES == (4, 8, 16, 32)
    assert cfg.num_anchors == 12
