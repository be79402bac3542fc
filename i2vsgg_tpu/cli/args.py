"""Shared CLI flag surface — parity with the reference's arg parser.

Rebuild of ``lib/model/utils/parser_func.py:5-213``: the same flag names and
defaults (so reference run scripts port over unchanged), minus GPU-specific
knobs that have no TPU meaning (``--cuda``, ``--mGPUs`` are accepted and
ignored) plus TPU-native additions (``--mesh``, ``--compute_dtype``).
``set_dataset_args`` wires all four dataset pairs, fixing the reference gap
where only MVRD/MVidVRD were wired (parser_func.py:193-213, SURVEY.md §8.3).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/eval an I2VSGG network")
    # datasets / net [parser_func.py:10-27]
    p.add_argument("--dataset", default="MVRD", type=str,
                   help="source training dataset")
    p.add_argument("--dataset_t", default="MVidVRD", type=str,
                   help="target training dataset")
    p.add_argument("--net", default="res101", type=str,
                   help="vgg16, res50, res101")
    # schedule
    p.add_argument("--start_epoch", default=1, type=int)
    p.add_argument("--epochs", dest="max_epochs", default=20, type=int)
    p.add_argument("--gamma", default=5, type=float)
    p.add_argument("--disp_interval", default=100, type=int)
    p.add_argument("--checkpoint_interval", default=10000, type=int)
    p.add_argument("--save_dir", default="models", type=str)
    p.add_argument("--load_name", default="models", type=str)
    p.add_argument("--nw", dest="num_workers", default=0, type=int)
    # accepted-and-ignored GPU flags so reference scripts run unchanged
    p.add_argument("--cuda", action="store_true",
                   help="[ignored on TPU]")
    p.add_argument("--mGPUs", action="store_true",
                   help="[ignored: DP is mesh-native]")
    # DA knobs [parser_func.py:53-67]
    p.add_argument("--gc", action="store_true",
                   help="global-level context vector")
    p.add_argument("--ic", action="store_true",
                   help="instance-level context vector")
    p.add_argument("--cr", action="store_true",
                   help="consistency regularization")
    p.add_argument("--ls", dest="large_scale", action="store_true")
    p.add_argument("--bs", dest="batch_size", default=1, type=int)
    p.add_argument("--cag", dest="class_agnostic", action="store_true")
    p.add_argument("--vis", action="store_true")
    # optimization [parser_func.py:78-112]
    p.add_argument("--o", dest="optimizer", default="sgd", type=str)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--eta", default=0.1, type=float)
    p.add_argument("--eta_uplmt", default=1, type=float)
    p.add_argument("--eta_style", default=0.01, type=float)
    p.add_argument("--lr_decay_step", default=5, type=int)
    p.add_argument("--lr_decay_gamma", default=0.1, type=float)
    p.add_argument("--s", dest="session", default=1, type=int)
    p.add_argument("--r", dest="resume", action="store_true")
    p.add_argument("--checksession", default=1, type=int)
    p.add_argument("--checkepoch", default=1, type=int)
    p.add_argument("--checkpoint", default=0, type=int)
    # logging [parser_func.py:115-126]
    p.add_argument("--use_tfb", dest="use_tfboard", action="store_true")
    p.add_argument("--tfb_path", type=str)
    p.add_argument("--image_dir", default="images")
    # style [parser_func.py:131-137]
    p.add_argument("--transform_method", default="scale", type=str)
    p.add_argument("--style_lambda", default=1e7, type=float)
    # vrd knobs [parser_func.py:139-196]
    p.add_argument("--num_classes", default=15, type=int)
    p.add_argument("--num_relations", default=62, type=int)
    p.add_argument("--zero_init_residual", action="store_true",
                   help="zero every bottleneck's bn3 scale at init. NOTE: "
                        "with this repo's FrozenBatchNorm (stop-gradient, "
                        "optimizer freezes all bn*) the zero scale NEVER "
                        "recovers — every residual branch is permanently "
                        "identity and its convs get zero gradient, so the "
                        "trained trunk degenerates to stem + downsample "
                        "convs. Use ONLY for from-scratch numerical-range "
                        "control on synthetic harnesses (it stops the "
                        "frozen-identity-BN variance doubling per block "
                        "that overflows bf16), never with pretrained "
                        "weights or when trunk quality matters")
    p.add_argument("--uint8_upload", action="store_true",
                   help="eval: upload resized uint8 BGR frames and do the "
                        "mean subtraction on device (4x smaller host->"
                        "device transfers — the axon-tunnel eval "
                        "bottleneck). Numerics differ from f32 transport "
                        "only by uint8 rounding of resized pixels")
    p.add_argument("--max_pairs", default=64, type=int,
                   help="static per-image pair padding in SGG training "
                        "(the 4096-wide fc6/fc7 cost scales with it)")
    p.add_argument("--source_so_prior_path",
                   default="./data/MVidVRD/source_so_prior.pkl")
    p.add_argument("--source_gt_rels_path",
                   default="./data/MVidVRD/source_gt_rels.pkl")
    p.add_argument("--target_gt_rels_path",
                   default="./data/MVidVRD/target_gt_rels.pkl")
    p.add_argument("--use_obj_visual", default=True, type=_bool)
    p.add_argument("--use_semantic", default=True, type=_bool)
    p.add_argument("--spatial_type", default=2, type=int)
    p.add_argument("--vrd_task", default="rel_det", type=str,
                   choices=("rel_det", "pre_det"))
    p.add_argument("--vrd_lr", default=1e-5, type=float)
    p.add_argument("--decay_spe", default=0, type=int,
                   help="steps-per-epoch anchor for the SGG x0.9/epoch lr "
                        "decay; 0 = use the loader's length. Parity runs "
                        "pass the pair-bearing image count so both arms "
                        "decay at identical update counts")
    p.add_argument("--glove_path", default="./models/glove.6B.300d.txt")
    p.add_argument("--predicate_file",
                   default="./data/MVidVRD/predicates.json")
    p.add_argument("--emb_dim", default=300, type=int)
    p.add_argument("--vrd_fc_dim", default=4096, type=int,
                   help="fc6/fc7 width of the vrd head (4096 = reference)")
    p.add_argument("--vrd_pooling", default="pool",
                   choices=("pool", "align"),
                   help="vrd-head roi pooling: 'pool' = reference parity "
                        "(resnet_SGG_emb.py:82 ROIPool), 'align' = RoIAlignAvg "
                        "(faster on TPU; train+serve must match). Recorded in "
                        "SGG checkpoint metadata; eval/serve read it back")
    p.add_argument("--int8_fc6", action="store_true",
                   help="eval/serve: run the vrd fc6/fc7 towers as int8 MXU "
                        "matmuls (DenseInt8 — checkpoint-compatible param "
                        "tree). ~2x matmul rate on the head's compute-bound "
                        "hot spot; quality-gate with tools/quant_ab.py")
    p.add_argument("--act_scales", default="",
                   help="eval: calibration JSON from tools/"
                        "calibrate_act_scales.py — with --int8_trunk "
                        "<kind>:<scope>, pre-quantize the in-scope trunk "
                        "kernels AND use STATIC per-tensor activation "
                        "scales instead of the per-conv dynamic abs-max "
                        "pass (the dynamic reduction is an unfusable "
                        "extra HBM pass per conv, PERF.md round 4)")
    p.add_argument("--int8_trunk", nargs="?", const="mxu", default="off",
                   help="eval/serve: run the ResNet bottleneck convs "
                        "int8-quantized (per-out-channel weights + "
                        "per-tensor dynamic activations — BNConv, "
                        "models/backbones.py). 'mxu' (the bare-flag "
                        "default) = real int8 convs, int32 accumulate, "
                        "~2x conv rate on v5e against the trunk's ~14 ms "
                        "serving line; 'sim' = the same quantized taps "
                        "convolved in fp32 (fake-quant — int8 convs run "
                        "~45x slower than bf16 on XLA:CPU, so CPU quality "
                        "gates use sim; equivalence test-pinned). Either "
                        "kind takes an optional layer scope, e.g. "
                        "'sim:layer1,layer2' = partial-depth int8 (only "
                        "convs whose module path contains a token "
                        "quantize — the full-trunk gate FAILED in round "
                        "4, so depth-restricted variants are the re-gate "
                        "candidates). Quality-gate with "
                        "tools/quant_trunk_ab.py")
    p.add_argument("--semi", action="store_true")
    # TPU-native additions
    p.add_argument("--mesh", default=0, type=int,
                   help="data-parallel mesh size (0 = all local devices)")
    p.add_argument("--pretrained_backbone", default="",
                   help="torch .pth (torchvision/caffe-converted layout) to "
                        "initialize the backbone from (reference: "
                        "cfg.RESNET_PATH, lib/model/utils/config.py:246-248)")
    p.add_argument("--pretrained_full", action="store_true",
                   help="with a jwyang-layout --pretrained_backbone: load "
                        "EVERY matching tensor (skip the detector-init "
                        "exclusion list; for parity experiments with a "
                        "fully shared init)")
    p.add_argument("--clip", default=-1.0, type=float,
                   help="global-norm gradient clip (reference "
                        "clip_gradient); -1 = auto (10 for vgg16, off "
                        "otherwise)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--max_steps", default=0, type=int,
                   help="hard step cap (0 = full epochs); for smoke runs")
    p.add_argument("--keep_ckpts", default=0, type=int,
                   help="keep only the newest K epoch checkpoints (plus the "
                        "best-metric one); 0 = keep all (reference parity)")
    p.add_argument("--video_ann", default="",
                   help="video_annotations JSON for relation metrics")
    p.add_argument("--profile_dir", default="",
                   help="write a jax.profiler trace of steps 10-20 here")
    p.add_argument("--cfg", dest="extra_cfgs", nargs="*", default=[],
                   help="extra KEY VALUE config overrides "
                        "(reference cfg_from_list format)")
    p.add_argument("--frame_map", default="",
                   help="frame->(video,fno) map pickle (data/VidOR/map.pkl)")
    return p.parse_args(argv)


def _bool(v):
    return str(v).lower() in ("1", "true", "yes")


# dataset name -> (train imdb, val imdb) wiring; extends the reference's
# MVRD/MVidVRD-only table [parser_func.py:193-213] to all four datasets.
_WIRING = {
    "MVRD": ("MVRD_trainval", "MVRD_test"),
    "MVidVRD": ("MVidVRD_val", "MVidVRD_test"),
    "MVG": ("MVG_trainval", "MVG_test"),
    "MVidOR": ("MVidOR_val", "MVidOR_test"),
}

_SET_CFGS = ["ANCHOR_SCALES", "[8, 16, 32]", "ANCHOR_RATIOS", "[0.5, 1, 2]",
             "TRAIN.MAX_NUM_GT_BOXES", "30"]


def set_dataset_args(args, test: bool = False):
    """Attach imdb names + cfg overrides. [parser_func.py:193-213]"""
    # trace-time env gates (BNConv reads these when the program traces);
    # set AND pop so a stale shell env can't leak into an A/B arm
    import os as _os
    mode = getattr(args, "int8_trunk", "off") or "off"
    kind, _, only = mode.partition(":")
    scope = f":{only}" if only else ""
    if kind == "mxu":
        _os.environ["I2VSGG_INT8_TRUNK"] = "1" + scope
    elif kind == "sim":
        _os.environ["I2VSGG_INT8_TRUNK"] = "sim" + scope
    elif kind == "off":
        _os.environ.pop("I2VSGG_INT8_TRUNK", None)
    else:
        raise ValueError(f"--int8_trunk: unknown kind {kind!r} "
                         "(off | mxu[:layers] | sim[:layers])")
    if not test:
        if args.dataset not in _WIRING:
            raise KeyError(f"unknown --dataset {args.dataset}")
        args.imdb_name = _WIRING[args.dataset][0]
        args.imdbval_name = _WIRING[args.dataset][1]
        args.set_cfgs = list(_SET_CFGS)
        if getattr(args, "dataset_t", None):
            if args.dataset_t not in _WIRING:
                raise KeyError(f"unknown --dataset_t {args.dataset_t}")
            args.imdb_name_target = _WIRING[args.dataset_t][0]
            args.imdbval_name_target = _WIRING[args.dataset_t][1]
            args.set_cfgs_target = list(_SET_CFGS)
    else:
        if args.dataset not in _WIRING:
            raise KeyError(f"unknown --dataset {args.dataset}")
        # test drivers evaluate the target's test split [parser_func.py:205]
        args.imdb_name = _WIRING[args.dataset][0]
        args.imdbval_name = _WIRING[args.dataset][1]
        args.set_cfgs = list(_SET_CFGS)
    # net -> YAML config wiring [parser_func.py:210-212]
    args.cfg_file = (f"cfgs/{args.net}_ls.yml" if args.large_scale
                     else f"cfgs/{args.net}.yml")
    return args
