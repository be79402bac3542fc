#!/usr/bin/env python
"""Quality-parity runs: train+eval BOTH the torch reference (on CPU via
parity.refshim) and our framework on the same learnable synthetic data,
and report detection mAP side by side (round-1 verdict item 1: the first
actual quality numbers).

Design choices for a fair comparison:
* same data, same loader (our DetectionLoader feeds both arms; torch gets
  NCHW conversions), same hyperparameters (the reference driver's loss
  assembly is replicated line-for-line from
  trainval_net_instance_styleD_bilinear.py:256-345).
* both arms are EVALUATED identically: the reference's trained weights are
  converted through the jwyang import map (value-parity-tested) into our
  checkpoint format, and tools/test_det.py computes VOC mAP for both.
* both arms run fp32 on CPU by default (set I2VSGG_PARITY_TPU=1 to run the
  "ours" arm on the TPU instead).

Usage:
  python tools/parity_run.py --out runs/parity --steps 300
  python tools/parity_run.py --out runs/parity --arm ours   # one arm only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# hyperparameters shared by both arms (reference scripts' Stage-A recipe,
# scaled to the synthetic set: anchors that fit 30-90 px objects, 240-px
# images, no pretrained init available in-image)
HP = dict(lr=1e-3, momentum=0.9, weight_decay=1e-4, double_bias=1,
          eta=0.1, eta_style=0.001, style_lambda=1.0, cr=False,
          scales=240, anchor_scales=[2, 4, 8], bs=1, depth=50)
CFG_OVERRIDES = ["ANCHOR_SCALES", "[2, 4, 8]",
                 "TRAIN.SCALES", "[240]", "TEST.SCALES", "[240]",
                 "TRAIN.RPN_PRE_NMS_TOP_N", "3000",
                 "TRAIN.RPN_POST_NMS_TOP_N", "256",
                 "TRAIN.RPN_POST_NMS_TOP_N_TARGET", "128",
                 "TEST.RPN_PRE_NMS_TOP_N", "3000",
                 "TEST.RPN_POST_NMS_TOP_N", "128",
                 "POOLING_MODE", "align"]


def make_data(root, n_source=48, n_target=24, seed=0):
    from tests.fixtures import make_learnable_dataset
    os.makedirs(root, exist_ok=True)
    # easy-to-learn regime (1 CPU core budgets the reference arm's steps):
    # 1-3 large objects per image
    make_learnable_dataset(root, "MVRD", n_source, ".jpg", seed=seed,
                           min_obj=1, max_obj=3, size_range=(50, 110))
    # target domain: same generator, different seed (MVidVRD uses .png and
    # video-frame naming)
    make_learnable_dataset(root, "MVidVRD", n_target, ".png", seed=seed + 1,
                           index_fmt="vid00_{:04d}",
                           min_obj=1, max_obj=3, size_range=(50, 110))
    return root


def _loaders(cfg, bs):
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    imdb_s, roidb_s, _, idx_s = combined_roidb("MVRD_trainval")
    imdb_t, roidb_t, _, idx_t = combined_roidb("MVidVRD_trainval")
    ls = DetectionLoader(roidb_s, idx_s, cfg, bs, training=True, seed=3)
    lt = DetectionLoader(roidb_t, idx_t, cfg, bs, training=True, seed=4)
    return imdb_s, ls, lt


def _our_cfg():
    from i2vsgg_tpu.config import Config, cfg_from_list
    return cfg_from_list(list(CFG_OVERRIDES), Config()).replace(
        COMPUTE_DTYPE="float32")


def train_reference(data_root, out_dir, steps, seed=0):
    """Train the reference styleD detector on CPU; save converted weights
    in OUR checkpoint format; return the checkpoint path prefix."""
    import torch
    from i2vsgg_tpu.parity.refshim import (build_reference_detector,
                                           reference_cfg)

    cfg_t = reference_cfg()
    cfg_t.POOLING_MODE = "align"
    cfg_t.ANCHOR_SCALES = HP["anchor_scales"]
    cfg_t.ANCHOR_RATIOS = [0.5, 1, 2]
    cfg_t.TRAIN.RPN_PRE_NMS_TOP_N = 3000
    cfg_t.TRAIN.RPN_POST_NMS_TOP_N = 256
    cfg_t.TRAIN.RPN_POST_NMS_TOP_N_TARGET = 128
    cfg_t.TRAIN.RPN_NMS_THRESH = 0.7

    torch.manual_seed(seed)
    np.random.seed(seed)
    cfg = _our_cfg()
    imdb_s, loader_s, loader_t = _loaders(cfg, HP["bs"])
    # same 16-way class space as our arm (the full MVRD class list; only
    # the 8 learnable classes appear in the data)
    ref = build_reference_detector(tuple(imdb_s.classes),
                                   depth=HP["depth"], ic=True, gc=True)
    ref.train()

    # reference optimizer: per-param groups, double-lr zero-decay biases
    # [trainval_…:134-148]
    groups = []
    for key, value in dict(ref.named_parameters()).items():
        if not value.requires_grad:
            continue
        if "bias" in key:
            groups.append({"params": [value],
                           "lr": HP["lr"] * (HP["double_bias"] + 1),
                           "weight_decay": 0})
        else:
            groups.append({"params": [value], "lr": HP["lr"],
                           "weight_decay": HP["weight_decay"]})
    opt = torch.optim.SGD(groups, momentum=HP["momentum"])

    def to_t(x):
        return torch.from_numpy(np.ascontiguousarray(x))

    step = 0
    t0 = time.time()
    while step < steps:
        it_s, it_t = iter(loader_s), iter(loader_t)
        for bs_, bt_ in zip(it_s, it_t):
            im = to_t(bs_["image"].transpose(0, 3, 1, 2))
            info = to_t(bs_["im_info"])
            gt = to_t(bs_["gt_boxes"])
            nb = to_t(bs_["num_boxes"].astype(np.int64))
            ref.zero_grad()
            (_, _, _, rpn_c, rpn_b, rc_c, rc_b, _, d_i, d_s) = ref(
                im, info, gt, nb, target=False,
                eta=HP["eta"], eta_style=HP["eta_style"])
            loss = rpn_c.mean() + rpn_b.mean() + rc_c.mean() + rc_b.mean()
            dloss_s_p = 0.5 * torch.mean(d_i ** 2)
            dloss_s_style = 0.5 * torch.mean(d_s ** 2)
            im_t = to_t(bt_["image"].transpose(0, 3, 1, 2))
            info_t = to_t(bt_["im_info"])
            gt0 = torch.zeros(HP["bs"], 1, 5)
            nb0 = torch.zeros(HP["bs"], dtype=torch.int64)
            d_i_t, d_s_t = ref(im_t, info_t, gt0, nb0, target=True,
                               eta=HP["eta"], eta_style=HP["eta_style"])
            dloss_t_p = 0.5 * torch.mean((1 - d_i_t) ** 2)
            dloss_t_style = 0.5 * torch.mean((1 - d_s_t) ** 2)
            loss = loss + dloss_s_p + dloss_t_p + HP["style_lambda"] * (
                dloss_s_style + dloss_t_style)
            opt.zero_grad()
            loss.backward()
            opt.step()
            step += 1
            if step % 20 == 0:
                print(f"[ref {step:4d}/{steps}] loss {float(loss):.4f} "
                      f"({(time.time() - t0) / step:.2f}s/step)", flush=True)
            if step >= steps:
                break

    # convert to our checkpoint format (evaluated by OUR eval driver)
    ref.eval()
    ckpt = save_converted(ref.state_dict(), imdb_s, out_dir, "ref", step)
    return ckpt


def save_converted(sd, imdb, out_dir, tag, step):
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.utils.torch_import import (jwyang_detector_params,
                                               merge_imported)
    from i2vsgg_tpu.train.checkpoint import save_checkpoint
    from i2vsgg_tpu.train.det_da import TrainState

    cfg = _our_cfg()
    model = FasterRCNN_DA(num_classes=len(imdb.classes), cfg=cfg,
                          backbone=f"res{HP['depth']}", ic=True, gc=True)
    init = dict(model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 240, 320, 3)),
        jnp.asarray([[240, 320, 1.0]]), mode="inference")["params"])
    init["netD_pixel"] = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 240, 320, 3)),
        jnp.asarray([[240, 320, 1.0]]), mode="target")["params"]["netD_pixel"]
    params = merge_imported(init, jwyang_detector_params(sd, HP["depth"]))
    ckpt_dir = os.path.join(out_dir, f"res{HP['depth']}", "MVRD",
                            f"session_{tag}")
    save_checkpoint(ckpt_dir, TrainState(params, (), 0), step,
                    metadata={"pooling_mode": "align", "arm": tag})
    return os.path.join(ckpt_dir, str(step))


def train_ours(data_root, out_dir, steps, seed=0):
    from tools.trainval_det_da import main as train_main
    epochs = max(1, -(-steps // 36))      # 36 source batches/epoch at bs 1
    state = train_main([
        "--dataset", "MVRD", "--dataset_t", "MVidVRD",
        "--net", f"res{HP['depth']}", "--bs", str(HP["bs"]),
        "--epochs", str(epochs), "--max_steps", str(steps),
        "--lr", str(HP["lr"]), "--eta", str(HP["eta"]),
        "--eta_style", str(HP["eta_style"]),
        "--style_lambda", str(HP["style_lambda"]),
        "--ic", "--gc", "--compute_dtype", "float32",
        "--disp_interval", "20", "--s", "901",
        "--save_dir", out_dir, "--cfg"] + CFG_OVERRIDES)
    step = int(state.step)
    return os.path.join(out_dir, f"res{HP['depth']}", "MVRD",
                        "session_901", str(step))


def eval_det(ckpt, out_dir, dataset="MVRD"):
    """VOC mAP on the held-out test split with OUR eval driver."""
    from tools.test_det import main as eval_main
    aps = eval_main([
        "--dataset", dataset, "--net", f"res{HP['depth']}",
        "--bs", "1", "--ic", "--gc", "--compute_dtype", "float32",
        "--save_dir", out_dir, "--load_name", ckpt, "--cfg"] + CFG_OVERRIDES)
    return float(aps["mAP"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--data", default="")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--arm", default="both", choices=("ours", "ref", "both"))
    args = ap.parse_args(argv)

    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        import jax
        jax.config.update("jax_platforms", "cpu")

    data_root = args.data or os.path.join(args.out, "data")
    if not os.path.isdir(os.path.join(data_root, "MVRD")):
        make_data(data_root)
        print(f"learnable dataset -> {data_root}")
    os.environ["I2VSGG_DATA_ROOT"] = data_root

    results = {}
    if args.arm in ("ours", "both"):
        t0 = time.time()
        ckpt = train_ours(data_root, args.out, args.steps)
        results["ours_train_s"] = round(time.time() - t0, 1)
        results["ours_mAP"] = eval_det(ckpt, args.out)
        print(f"OURS mAP: {results['ours_mAP']:.4f}")
    if args.arm in ("ref", "both"):
        t0 = time.time()
        ckpt = train_reference(data_root, args.out, args.steps)
        results["ref_train_s"] = round(time.time() - t0, 1)
        results["ref_mAP"] = eval_det(ckpt, args.out)
        print(f"REFERENCE mAP: {results['ref_mAP']:.4f}")

    results["steps"] = args.steps
    path = os.path.join(args.out, "parity_det.json")
    os.makedirs(args.out, exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
