#!/usr/bin/env python
"""Train a res101-form Stage-A checkpoint for the round-5 serving gates.

Round-4 verdict weakness #2: every serving quality gate (rpn capacity,
int8 trunk scope, static act scales) evaluated res50 parity checkpoints
while the bench/serving program is res101 — int8 sensitivity and roi
capacity effects are depth-dependent, so the gates must run at the
shipping depth. This tool trains OUR detector (the exact model family
``bench.py``/``serve_video.py`` deploy: ``FasterRCNN_DA(backbone=
"res101")``) on the regenerated round-3 parity corpus so the follow-up
A/Bs (tools/capacity_ab.py, tools/quant_trunk_ab.py,
tools/calibrate_act_scales.py) gate a matching-architecture model.

Schedule: the parity campaign's recipe (tools/parity_run.py HP —
reference Stage-A hyperparams of
/root/reference/scripts/instance_styleD_resnet101.sh:3-27 scaled to the
240-px synthetic corpus) with a compressed decay point: the 672-step
res50 campaign decayed x0.1 at step 480 (epoch 6 of 96-step epochs,
the reference's ``lr_decay_step=5`` rule); at res101 CPU step cost the
wall-clock budget caps the run at fewer steps, so ``--lr_decay_step``
defaults to 2 (decay at step 192 of a 288-step run) — same
full-lr:decayed-lr ratio shape, fewer steps. The gate A/Bs only need a
converged-enough non-degenerate detector (bench._GATE_FLOOR guards
against a broken arm); absolute mAP is not compared across depths.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ensure_parity_data(data_root: str):
    """Regenerate the round-3 parity corpus bit-identically when absent.

    Advisor r4: gate regeneration on ALL required artifacts — a
    partially lost data dir (MVRD present but MVidVRD or its
    source_so_prior.pkl gone after a VM reset) must fail fast, not
    train on a mismatched mixture.
    """
    from tools.parity_run import make_data
    required = [os.path.join(data_root, "MVRD"),
                os.path.join(data_root, "MVidVRD"),
                os.path.join(data_root, "MVidVRD", "source_so_prior.pkl")]
    missing = [p for p in required if not os.path.exists(p)]
    if missing and len(missing) < len(required):
        raise SystemExit(
            f"partial data root {data_root}: missing {missing} while other "
            "artifacts exist — delete the directory and rerun to regenerate "
            "a consistent corpus")
    if missing:
        # the round-3 campaign's exact generation parameters
        # (PARITY_RUNS.md setup: 48/252 source split, 20 videos x 24
        # frames at 10/10) — make_data seeds every RNG
        make_data(data_root, n_source=300, source_split=0.16,
                  n_target=20, target_split=0.5, video_target=True,
                  n_frames=24, hard_videos=False)
        print(f"parity dataset regenerated -> {data_root}", flush=True)


BENCH600_CFG = ["ANCHOR_SCALES", "[4, 8, 16]",
                "TRAIN.SCALES", "[600]", "TEST.SCALES", "[600]",
                "TRAIN.RPN_PRE_NMS_TOP_N", "6000",
                "TRAIN.RPN_POST_NMS_TOP_N", "256",
                "TRAIN.RPN_POST_NMS_TOP_N_TARGET", "128",
                "TEST.RPN_PRE_NMS_TOP_N", "6000",
                "POOLING_MODE", "align"]


def ensure_bench600_data(data_root: str):
    """600-short-side learnable corpus at the bench's serving scale
    (tools/capacity_ab.py's geometry: cfgs/res101.yml anchors)."""
    from tests.fixtures import make_learnable_dataset
    required = [os.path.join(data_root, "MVRD"),
                os.path.join(data_root, "MVidVRD"),
                os.path.join(data_root, "MVidVRD", "source_so_prior.pkl")]
    missing = [p for p in required if not os.path.exists(p)]
    if missing and len(missing) < len(required):
        raise SystemExit(f"partial data root {data_root}: missing "
                         f"{missing} — delete and rerun")
    if not missing:
        return
    os.makedirs(data_root, exist_ok=True)
    make_learnable_dataset(data_root, "MVRD", 200, ".jpg", seed=11,
                           hw=(600, 800), split_frac=0.4,
                           min_obj=2, max_obj=6, size_range=(60, 220))
    # target sized so steps-per-epoch = min(source, target) stays at the
    # source's 160 (80 train stills x flip): the DA loop consumes one
    # batch per domain per step
    make_learnable_dataset(data_root, "MVidVRD", 100, ".png", seed=12,
                           hw=(600, 800), index_fmt="vid00_{:04d}",
                           split_frac=0.8,
                           min_obj=2, max_obj=6, size_range=(60, 220))
    import pickle
    prior = __import__("numpy").random.RandomState(9).dirichlet(
        __import__("numpy").ones(5), size=(15, 15))
    with open(os.path.join(data_root, "MVidVRD",
                           "source_so_prior.pkl"), "wb") as f:
        pickle.dump(prior, f)
    print(f"bench600 dataset -> {data_root}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r5")
    ap.add_argument("--data", default="",
                    help="data root (default <out>/data)")
    ap.add_argument("--steps", type=int, default=288)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--lr_decay_step", type=int, default=2,
                    help="decay x0.1 every N epochs (96-step epochs)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--profile", default="parity240",
                    choices=["parity240", "bench600"],
                    help="parity240 = the round-3 parity corpus/recipe; "
                         "bench600 = the bench's 600-px serving scale "
                         "and reference anchors (cfgs/res101.yml) on a "
                         "600-scale learnable corpus — gates evaluated "
                         "at the EXACT scale the headline serves "
                         "(round-4 verdict item 8's deployment-scale "
                         "arm, architecture AND scale)")
    args = ap.parse_args(argv)

    import jax
    # identical runtime config to parity_run.main: CPU platform unless
    # I2VSGG_PARITY_TPU=1 (the gate arm has NO torch-reference twin, so
    # nothing ties it to the CPU — on the chip the 288-step train is
    # minutes instead of hours), persistent compile cache, fp32 matmuls
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")
    else:
        # keep the host CPU backend registered alongside the chip: the
        # driver inits params there (eager ops through the tunnel are
        # ~one RPC each) and device_puts once
        jax.config.update("jax_platforms", "axon,cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "float32")

    from tools import parity_run as pr
    pr.HP["depth"] = args.depth
    if args.profile == "bench600":
        pr.HP["scales"] = 600
        pr.HP["anchor_scales"] = [4, 8, 16]
        pr.CFG_OVERRIDES = list(BENCH600_CFG)

    data_root = args.data or os.path.join(args.out, "data")
    if args.profile == "bench600":
        ensure_bench600_data(data_root)
    else:
        ensure_parity_data(data_root)
    os.environ["I2VSGG_DATA_ROOT"] = data_root

    from tools.trainval_det_da import main as train_main
    init_pth = pr.shared_init(data_root, args.out)
    cfg = pr._our_cfg()
    _, ls, lt = pr._loaders(cfg, pr.HP["bs"])
    spe = min(len(ls), len(lt))
    epochs = max(1, -(-args.steps // spe))
    session = str(901 + args.seed)
    train_main([
        "--dataset", "MVRD", "--dataset_t", "MVidVRD",
        "--net", f"res{args.depth}", "--bs", str(pr.HP["bs"]),
        "--epochs", str(epochs), "--max_steps", str(args.steps),
        "--lr", str(pr.HP["lr"]), "--lr_decay_step",
        str(args.lr_decay_step),
        "--eta", str(pr.HP["eta"]),
        "--eta_style", str(pr.HP["eta_style"]),
        "--style_lambda", str(pr.HP["style_lambda"]),
        "--clip", str(pr.HP["clip"]),
        "--pretrained_backbone", init_pth, "--pretrained_full",
        "--ic", "--gc", "--compute_dtype", "float32",
        "--disp_interval", "20", "--s", session,
        "--save_dir", args.out, "--cfg"] + pr.CFG_OVERRIDES
        + ["RNG_SEED", str(pr._run_seed(args.seed))])
    ckpt_dir = os.path.join(args.out, f"res{args.depth}", "MVRD",
                            f"session_{session}")
    print(f"gate arm ckpts -> {ckpt_dir}", flush=True)
    return ckpt_dir


if __name__ == "__main__":
    main()
