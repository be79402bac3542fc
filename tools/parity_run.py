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
# scaled to the synthetic set: anchors that fit 50-110 px objects, 240-px
# images). No pretrained weights exist in-image, so BOTH arms start from
# the SAME random torch init (exported once, imported into ours via the
# value-parity-tested jwyang map) and clip gradients at 10 (from-scratch
# res50 at pixel scale explodes by step 3 otherwise — in both frameworks).
HP = dict(lr=5e-4, momentum=0.9, weight_decay=1e-4, double_bias=1,
          eta=0.1, eta_style=0.001, style_lambda=1.0, cr=False, clip=10.0,
          scales=240, anchor_scales=[2, 4, 8], bs=1, depth=50)
CFG_OVERRIDES = ["ANCHOR_SCALES", "[2, 4, 8]",
                 "TRAIN.SCALES", "[240]", "TEST.SCALES", "[240]",
                 "TRAIN.RPN_PRE_NMS_TOP_N", "3000",
                 "TRAIN.RPN_POST_NMS_TOP_N", "256",
                 "TRAIN.RPN_POST_NMS_TOP_N_TARGET", "128",
                 "TEST.RPN_PRE_NMS_TOP_N", "3000",
                 "TEST.RPN_POST_NMS_TOP_N", "128",
                 "POOLING_MODE", "align"]


def make_data(root, n_source=48, n_target=24, seed=0, source_split=0.75,
              target_split=0.75, video_target=False, n_frames=24,
              hard_videos=False):
    from tests.fixtures import (make_learnable_dataset,
                                make_learnable_video_dataset)
    os.makedirs(root, exist_ok=True)
    # easy-to-learn regime (1 CPU core budgets the reference arm's steps):
    # 1-3 large objects per image
    make_learnable_dataset(root, "MVRD", n_source, ".jpg", seed=seed,
                           split_frac=source_split,
                           min_obj=1, max_obj=3, size_range=(50, 110))
    if video_target:
        # target domain = real (synthetic) VIDEOS: Stage A uses the
        # trainval frames as DA target stills; Stage C evaluates trained
        # relation R@50 on the held-out videos.
        # hard_videos de-saturates R@50 (round-3 verdict item 6: 32 GT over
        # 10 videos made every arm score 1.0): 4-6 objects per video (with
        # same-class ambiguity for the greedy association to confuse),
        # smaller boxes, faster motion -> many short GT runs near the
        # 10-frame minimum, so each video carries ~40-80 GT instances and
        # the per-video top-50 cut [lib/utils.py:424-443] can actually bind.
        vid_kw = (dict(min_obj=4, max_obj=6, size_range=(30, 70),
                       max_speed=7) if hard_videos
                  else dict(size_range=(50, 110)))
        make_learnable_video_dataset(root, "MVidVRD", n_videos=n_target,
                                     n_frames=n_frames, seed=seed + 1,
                                     split_frac=target_split, **vid_kw)
    else:
        # target domain: same still generator, different seed (MVidVRD
        # uses .png and video-frame naming)
        make_learnable_dataset(root, "MVidVRD", n_target, ".png",
                               seed=seed + 1, index_fmt="vid00_{:04d}",
                               split_frac=target_split,
                               min_obj=1, max_obj=3, size_range=(50, 110))
    # so-prior pickle (the reference vrd module loads it at __init__)
    import pickle
    prior = np.random.RandomState(9).dirichlet(np.ones(N_REL),
                                               size=(15, 15))
    with open(os.path.join(root, "MVidVRD", "source_so_prior.pkl"),
              "wb") as f:
        pickle.dump(prior, f)
    return root


def _loaders(cfg, bs, seed=3):
    """Shared data loaders. ``seed`` controls the shuffle order; our arm's
    driver uses cfg.RNG_SEED for the same two loaders, so passing the same
    value here gives both arms the SAME data order for a given run seed."""
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    imdb_s, roidb_s, _, idx_s = combined_roidb("MVRD_trainval")
    imdb_t, roidb_t, _, idx_t = combined_roidb("MVidVRD_trainval")
    ls = DetectionLoader(roidb_s, idx_s, cfg, bs, training=True, seed=seed)
    lt = DetectionLoader(roidb_t, idx_t, cfg, bs, training=True,
                         seed=seed + 1)
    return imdb_s, ls, lt


def _run_seed(seed: int) -> int:
    """Per-run RNG stream base: seed 0 keeps the historical value 3."""
    return 3 + 1000 * seed


def _our_cfg():
    from i2vsgg_tpu.config import Config, cfg_from_list
    return cfg_from_list(list(CFG_OVERRIDES), Config()).replace(
        COMPUTE_DTYPE="float32")


def shared_init(data_root, out_dir, seed=0):
    """Build the reference model once and export its random init as the
    SHARED starting point for both arms. Returns the .pth path."""
    import torch
    path = os.path.join(out_dir, "shared_init.pth")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    from i2vsgg_tpu.parity.refshim import build_reference_detector
    torch.manual_seed(seed)
    cfg = _our_cfg()
    imdb_s, _, _ = _loaders(cfg, HP["bs"])
    ref = build_reference_detector(tuple(imdb_s.classes),
                                   depth=HP["depth"], ic=True, gc=True)
    # zero-init-residual: with FROZEN identity BN, kaiming-init residual
    # blocks double the activation variance per block (2^16 over res50) and
    # step-1 gradients overflow fp32 in BOTH frameworks. The reference only
    # ever trains from COCO-pretrained weights; from scratch, zeroing each
    # block's last BN scale (bn3) makes blocks start as identity — the
    # standard from-scratch ResNet recipe, applied to the SHARED init.
    with torch.no_grad():
        for name, m in ref.named_modules():
            if name.endswith("bn3"):
                m.weight.zero_()
    torch.save(ref.state_dict(), path)
    return path


def lr_at(step, steps_per_epoch):
    """The SHARED decay rule, identical in both arms: x0.1 at the start of
    (1-indexed) epoch 6, 11, ... — the reference driver's
    ``(epoch > 1) and ((epoch-1) % lr_decay_step == 0)`` with
    lr_decay_step=5 (trainval_…:232-234), which our
    ``step_decay_schedule`` reproduces as ``(step//spe)//5`` decays.
    ``step`` is the 0-indexed update count. Round-2's harness decayed the
    reference arm ONCE at a hardcoded step 180 (36 steps/epoch) while our
    arm decayed on the real 48-step epochs REPEATEDLY (x0.01 by step 480,
    x0.001 by 720) — the root cause of the round-2 'ours plateaus at
    0.164 while the reference reaches 0.250' asymmetry."""
    return HP["lr"] * (0.1 ** ((step // steps_per_epoch) // 5))


def train_reference(data_root, out_dir, steps, seed=0, snap_steps=()):
    """Train the reference styleD detector on CPU; save converted weights
    in OUR checkpoint format; return {step: ckpt_path} including the final
    step and any intermediate ``snap_steps``."""
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
    imdb_s, loader_s, loader_t = _loaders(cfg, HP["bs"], _run_seed(seed))
    spe = min(len(loader_s), len(loader_t))   # == our driver's value
    # same 16-way class space as our arm (the full MVRD class list; only
    # the 8 learnable classes appear in the data)
    ref = build_reference_detector(tuple(imdb_s.classes),
                                   depth=HP["depth"], ic=True, gc=True)
    ref.load_state_dict(torch.load(shared_init(data_root, out_dir),
                                   weights_only=True))
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

    tag = f"ref{seed}"
    ckpts = {}
    # per-component loss log, schema-compatible with our driver's
    # metrics.jsonl — the bisection tool for any residual Stage-A gap is
    # per-component trajectory comparison from the same init/data order
    log_dir = os.path.join(out_dir, f"res{HP['depth']}", "MVRD",
                           f"session_{tag}", "logs")
    os.makedirs(log_dir, exist_ok=True)
    mlog = open(os.path.join(log_dir, "metrics.jsonl"), "w")

    def snapshot(at_step):
        ref.eval()
        ckpts[at_step] = save_converted(ref.state_dict(), imdb_s, out_dir,
                                        tag, at_step)
        ref.train()

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
            mlog.write(json.dumps({
                "step": step, "loss": float(loss),
                "loss_rpn_cls": float(rpn_c.mean()),
                "loss_rpn_box": float(rpn_b.mean()),
                "loss_rcnn_cls": float(rc_c.mean()),
                "loss_rcnn_box": float(rc_b.mean()),
                "dloss_s_p": float(dloss_s_p), "dloss_t_p": float(dloss_t_p),
                "dloss_s_style": float(dloss_s_style),
                "dloss_t_style": float(dloss_t_style)}) + "\n")
            opt.zero_grad()
            loss.backward()
            # reference clip_gradient semantics (net_utils.py:88-99):
            # scale all grads by clip/max(total_norm, clip)
            total = 0.0
            for p_ in ref.parameters():
                if p_.requires_grad and p_.grad is not None:
                    total += float(p_.grad.norm()) ** 2
            scale = HP["clip"] / max(total ** 0.5, HP["clip"])
            for p_ in ref.parameters():
                if p_.requires_grad and p_.grad is not None:
                    p_.grad.mul_(scale)
            # the SHARED schedule (see lr_at): step is the 0-indexed count
            # of this update, mirroring optax.scale_by_schedule's counter
            cur = lr_at(step, spe)
            for g in opt.param_groups:
                g["lr"] = cur * (2.0 if g["weight_decay"] == 0 else 1.0)
            opt.step()
            step += 1
            if step in snap_steps and step < steps:
                snapshot(step)
            if step % 20 == 0:
                print(f"[ref{seed} {step:4d}/{steps}] loss {float(loss):.4f}"
                      f" lr {cur:.2e}"
                      f" ({(time.time() - t0) / step:.2f}s/step)", flush=True)
            if step >= steps:
                break

    # convert to our checkpoint format (evaluated by OUR eval driver)
    snapshot(step)
    mlog.close()
    return ckpts


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
    """Train our arm via the normal driver (shared init, shared data order,
    shared schedule — the driver's step_decay_schedule with lr_decay_step=5
    equals lr_at() since both use spe = min(len(ls), len(lt))). Returns the
    checkpoint dir (per-epoch checkpoints inside)."""
    from tools.trainval_det_da import main as train_main
    init_pth = shared_init(data_root, out_dir)
    cfg = _our_cfg()
    _, ls, lt = _loaders(cfg, HP["bs"])
    spe = min(len(ls), len(lt))
    epochs = max(1, -(-steps // spe))
    session = str(901 + seed)
    train_main([
        "--dataset", "MVRD", "--dataset_t", "MVidVRD",
        "--net", f"res{HP['depth']}", "--bs", str(HP["bs"]),
        "--epochs", str(epochs), "--max_steps", str(steps),
        "--lr", str(HP["lr"]), "--lr_decay_step", "5",
        "--eta", str(HP["eta"]),
        "--eta_style", str(HP["eta_style"]),
        "--style_lambda", str(HP["style_lambda"]),
        "--clip", str(HP["clip"]),
        "--pretrained_backbone", init_pth, "--pretrained_full",
        "--ic", "--gc", "--compute_dtype", "float32",
        "--disp_interval", "20", "--s", session,
        "--save_dir", out_dir, "--cfg"] + CFG_OVERRIDES
        + ["RNG_SEED", str(_run_seed(seed))])
    return os.path.join(out_dir, f"res{HP['depth']}", "MVRD",
                        f"session_{session}")


def ours_ckpts(ckpt_dir, want_steps):
    """Map each wanted step to the nearest saved checkpoint step.

    Warns loudly when the nearest checkpoint is far from the wanted step
    (> half the save cadence) or when two wanted steps collapse onto the
    same checkpoint — either silently mislabels intermediate-eval points
    in the parity curves."""
    import re
    steps = sorted(int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
                   if re.fullmatch(r"step_\d+", d))
    cadence = min((b - a for a, b in zip(steps, steps[1:])), default=0)
    out, taken = {}, {}
    for wsw in sorted(want_steps):
        near = min(steps, key=lambda s: abs(s - wsw))
        if cadence and abs(near - wsw) > cadence / 2:
            print(f"WARNING: wanted step {wsw} resolves to checkpoint "
                  f"{near} ({abs(near - wsw)} steps away, save cadence "
                  f"{cadence}) — eval point will be mislabeled", flush=True)
        if near in taken:
            print(f"WARNING: wanted steps {taken[near]} and {wsw} both "
                  f"resolve to checkpoint {near}; keeping one eval",
                  flush=True)
        taken[near] = wsw
        out[near] = os.path.join(ckpt_dir, str(near))
    return out


def eval_det(ckpt, out_dir, dataset="MVRD"):
    """VOC mAP on the held-out test split with OUR eval driver.

    bs 4 (all fixture images share one shape, so batching only cuts the
    per-image tunnel round trips — outputs are per-image identical)."""
    from tools.test_det import main as eval_main
    aps = eval_main([
        "--dataset", dataset, "--net", f"res{HP['depth']}",
        "--bs", "4", "--ic", "--gc", "--compute_dtype", "float32",
        "--save_dir", out_dir, "--load_name", ckpt, "--cfg"] + CFG_OVERRIDES)
    return float(aps["mAP"])


# ---------------------------------------------------------------------------
# Stage B: relation (vrd) head parity — both arms train their vrd head on
# the SAME frozen shared-init trunk and are scored with the same
# predicate-classification metrics (top-1 accuracy + per-predicate AP) on
# the held-out split's GT pairs.
# ---------------------------------------------------------------------------

N_REL = 5                      # geometry predicates (tests.fixtures)
SGG_LR = 1e-3                  # Stage-B vrd lr, shared by both arms


def _sgg_spe():
    """Pair-bearing trainval image count == effective updates per epoch in
    BOTH arms (our driver skips zero-pair batches; the ref arm's data list
    excludes them) — the shared anchor for the x0.9/epoch decay."""
    return len(_stage_b_data("trainval"))


def sgg_lr_at(step, spe):
    """The reference Stage-B schedule: vrd_lr x0.9 at every epoch boundary
    [scripts/SGG_emb_resnet.sh lr_decay_step=1 gamma=0.9,
    trainval_net_SGG_emb.py:199-202], step-anchored identically in both
    arms (round-3 fix: the ref arm previously ran CONSTANT lr)."""
    return SGG_LR * (0.9 ** (step // max(spe, 1)))


def _prd_vecs():
    return np.random.RandomState(0).randn(N_REL, 300).astype(np.float32)


def _pairs_of(rels):
    """Reference pair dedup: unique ordered pairs, multi-label targets.
    [faster_rcnn_SGG_emb.py:184-237]"""
    pairs, labels = [], []
    for s, p, o in rels:
        if (s, o) not in pairs:
            pairs.append((s, o))
            labels.append(np.zeros(N_REL, np.float32))
        labels[pairs.index((s, o))][p] = 1.0
    return pairs, labels


def _stage_b_data(split):
    """(index, image(H,W,3) float BGR prepped, scale, boxes, classes,
    pairs, labels) per image of a split."""
    import pickle
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.data.pipeline import imread_bgr, prep_image
    cfg = _our_cfg()
    imdb, roidb, _, _ = combined_roidb(f"MVRD_{split}", use_flipped=False)
    with open(os.path.join(os.environ["I2VSGG_DATA_ROOT"], "MVRD",
                           "source_gt_rels.pkl"), "rb") as f:
        gt_rels = pickle.load(f)
    out = []
    for e in roidb:
        index = os.path.splitext(os.path.basename(e["image"]))[0]
        im, scale = prep_image(imread_bgr(e["image"]), 240, cfg.PIXEL_MEANS)
        pairs, labels = _pairs_of(gt_rels.get(index, []))
        if not pairs:
            continue
        out.append((index, im, scale, e["boxes"] * scale,
                    e["gt_classes"], pairs, labels))
    return out


def train_reference_sgg(data_root, out_dir, steps, seed=0):
    """Train the reference vrd module on CPU over the shared frozen trunk;
    return a score_fn(image, scale, boxes) -> (P, n_rel) softmax scores."""
    import torch
    import types as _types
    from i2vsgg_tpu.parity.refshim import (install_reference_shims,
                                           build_reference_detector,
                                           patch_cuda_noop)
    install_reference_shims()
    patch_cuda_noop()
    from model.faster_rcnn.resnet_SGG_emb import vrd as VRD

    torch.manual_seed(seed + 5)
    det = build_reference_detector(
        tuple(_loaders(_our_cfg(), 1)[0].classes), depth=HP["depth"],
        ic=True, gc=True)
    det.load_state_dict(torch.load(shared_init(data_root, out_dir),
                                   weights_only=True))
    trunk = det.RCNN_base.eval()
    for p in trunk.parameters():
        p.requires_grad_(False)

    vargs = _types.SimpleNamespace(
        num_relations=N_REL, num_classes=16, emb_dim=300,
        use_obj_visual=True, spatial_type=2,
        source_so_prior_path=os.path.join(data_root, "MVidVRD",
                                          "source_so_prior.pkl"),
        source_gt_rels_path=os.path.join(data_root, "MVRD",
                                         "source_gt_rels.pkl"),
        target_gt_rels_path=os.path.join(data_root, "MVidVRD",
                                         "source_gt_rels.pkl"))
    obj_vecs = np.zeros((16, 300), np.float32)
    head = VRD(vargs, all_obj_vecs=obj_vecs, all_prd_vecs=_prd_vecs())
    head.train()
    # reference driver's param groups [trainval_net_SGG_emb.py:129-148]:
    # weights at vrd_lr + weight decay, biases at 2x lr + no decay. The
    # round-2 harness used a single constant-lr no-decay group here while
    # OUR arm ran the real recipe (x0.9/epoch decay + wd + bias split) — a
    # systematic arm asymmetry, fixed for the round-3 reruns.
    groups = []
    for key, value in dict(head.named_parameters()).items():
        if "bias" in key:
            groups.append({"params": [value], "lr": SGG_LR * 2,
                           "weight_decay": 0.0})
        else:
            groups.append({"params": [value], "lr": SGG_LR,
                           "weight_decay": HP["weight_decay"]})
    opt = torch.optim.SGD(groups, momentum=HP["momentum"])

    data = _stage_b_data("trainval")
    fmaps = {}

    def fmap_of(index, im):
        if index not in fmaps:
            with torch.no_grad():
                t = torch.from_numpy(
                    im.transpose(2, 0, 1)[None].astype(np.float32))
                fmaps[index] = trunk(t).numpy()
        return fmaps[index]

    def build_inputs(im, scale, boxes, pairs):
        ih, iw = im.shape[:2]
        n = len(pairs)
        rel_boxes = np.zeros((n, 5))
        spatial = np.zeros((n, 2, 32, 32))
        for ii, (s, o) in enumerate(pairs):
            rel_boxes[ii, 1:5] = head._getUnionBBox(boxes[s], boxes[o],
                                                    ih, iw)
            spatial[ii] = [head._getDualMask(ih, iw, boxes[s]),
                           head._getDualMask(ih, iw, boxes[o])]
        b5 = np.zeros((len(boxes), 5), np.float32)
        b5[:, 1:5] = boxes
        ixs = np.asarray([p[0] for p in pairs])
        ixo = np.asarray([p[1] for p in pairs])
        return b5, rel_boxes, spatial, ixs, ixo

    spe = len(data)
    step = t0 = 0
    t0 = time.time()
    while step < steps:
        for index, im, scale, boxes, classes, pairs, labels in data:
            fmap = fmap_of(index, im)
            b5, rb, sp, ixs, ixo = build_inputs(im, scale, boxes, pairs)
            scores, _ = head(fmap, b5, rb, sp, classes, ixs, ixo)
            target = torch.from_numpy(np.stack(labels).astype(np.float32))
            loss = head.criterion(scores, target)
            opt.zero_grad()
            loss.backward()
            cur = sgg_lr_at(step, spe)
            for g in opt.param_groups:
                g["lr"] = cur * (2.0 if g["weight_decay"] == 0 else 1.0)
            opt.step()
            step += 1
            if step % 50 == 0:
                print(f"[ref-sgg {step:4d}/{steps}] loss {float(loss):.4f} "
                      f"({(time.time() - t0) / step:.2f}s/step)", flush=True)
            if step >= steps:
                break

    head.eval()

    def score_fn(index, im, scale, boxes, pairs):
        fmap = fmap_of(index, im)
        b5, rb, sp, ixs, ixo = build_inputs(im, scale, boxes, pairs)
        with torch.no_grad():
            s, _ = head(fmap, b5, rb, sp,
                        np.zeros(len(boxes)), ixs, ixo)
        return s.numpy()

    return score_fn


def train_ours_sgg(data_root, out_dir, steps, seed=0):
    """Train our SGG head from the shared trunk via the normal driver;
    return a score_fn like train_reference_sgg's."""
    import jax
    import jax.numpy as jnp
    from tools.trainval_sgg import main as sgg_main
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.train.checkpoint import latest_step, restore_intersection

    # Stage-A-format checkpoint of the shared init (trunk source)
    import torch
    sd = torch.load(shared_init(data_root, out_dir), weights_only=True)
    imdb_s, _, _ = _loaders(_our_cfg(), 1)
    det_ckpt = save_converted(sd, imdb_s, out_dir, "shared", 0)

    session = str(951 + seed)
    ckpt_dir = os.path.join(out_dir, f"res{HP['depth']}", "MVRD_SGG",
                            f"session_{session}")
    if (latest_step(ckpt_dir) or 0) >= steps:
        # already trained to the target step (e.g. an earlier --stage bc
        # lane died between its B eval and C eval) — reuse the checkpoint
        # instead of retraining ~45 min. Training is deterministic per
        # seed, so the score_fn below is identical either way.
        print(f"train_ours_sgg: reusing {ckpt_dir} @ "
              f"{latest_step(ckpt_dir)}", flush=True)
        return _ours_sgg_score_fn(ckpt_dir)
    spe = _sgg_spe()      # effective (pair-bearing) updates per epoch
    epochs = max(1, -(-steps // max(spe, 1)))
    sgg_main([
        "--dataset", "MVRD", "--net", f"res{HP['depth']}", "--bs", "1",
        "--epochs", str(epochs), "--max_steps", str(steps),
        "--vrd_lr", str(SGG_LR), "--decay_spe", str(spe),
        "--num_relations", str(N_REL),
        "--source_gt_rels_path",
        os.path.join(data_root, "MVRD", "source_gt_rels.pkl"),
        "--compute_dtype", "float32", "--disp_interval", "50",
        "--s", session, "--max_pairs", "12",
        # SGG checkpoints are ~1.7 GB each (fc6 is 206M params + momentum
        # trace) and the driver saves per 31-step epoch — without GC a
        # 672-step run writes 36 GB and a 3-seed campaign fills the disk
        # (ENOSPC, observed)
        "--keep_ckpts", "1",
        "--save_dir", out_dir, "--load_name", det_ckpt,
        "--cfg"] + CFG_OVERRIDES + ["RNG_SEED", str(_run_seed(seed)),
                                    "TRAIN.MAX_NUM_GT_BOXES", "4"])

    return _ours_sgg_score_fn(ckpt_dir)


def _ours_sgg_score_fn(ckpt_dir, raw=False):
    """Build the per-frame predicate-scoring closure from a trained
    ours-arm SGG checkpoint directory (tail of train_ours_sgg).

    raw=True returns the cosine logits instead of their softmax — the
    Stage-B calibration study (tools/stage_b_rescore.py) applies score
    transforms on the host; the PARITY protocol remains softmax."""
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.train.checkpoint import latest_step, restore_intersection

    step = latest_step(ckpt_dir)
    model = SGGModel(trunk=ResNetTrunk(depth=HP["depth"],
                                       dtype=jnp.float32),
                     vrd=VRDHead(), n_rel=N_REL)
    prd = jnp.asarray(_prd_vecs())

    def init_params(n_pairs):
        z = jnp.zeros
        return model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            z((1, 240, 320, 3)), jnp.asarray([240.0, 320, 1.0]),
            z((4, 4)), z((4,), jnp.int32), z((n_pairs,), jnp.int32),
            z((n_pairs,), jnp.int32), z((n_pairs,), bool), prd)["params"]

    params = jax.device_put(
        restore_intersection(ckpt_dir, step, init_params(4)))

    # fixed shapes (GB boxes / PB pairs) so ONE jitted program serves every
    # frame — per-call tracing through the axon tunnel would dominate the
    # video-eval loop otherwise
    GB, PB = 8, 56

    @jax.jit
    def _score(params, im, info, boxes, ix1, ix2, pv):
        out = model.apply({"params": params}, im, info, boxes,
                          jnp.zeros((GB,), jnp.int32), ix1, ix2, pv, prd)
        s = out["scores"]
        return s if raw else jax.nn.softmax(s, -1)

    def score_fn(index, im, scale, boxes, pairs):
        n, p = len(boxes), len(pairs)
        assert n <= GB and p <= PB, (n, p)
        bx = np.zeros((GB, 4), np.float32)
        bx[:n] = boxes
        ix1 = np.zeros((PB,), np.int32)
        ix2 = np.zeros((PB,), np.int32)
        ix1[:p] = [q[0] for q in pairs]
        ix2[:p] = [q[1] for q in pairs]
        pv = np.arange(PB) < p
        h, w = im.shape[:2]
        s = _score(params, jnp.asarray(im[None].astype(np.float32)),
                   jnp.asarray([float(h), float(w), 1.0]), jnp.asarray(bx),
                   jnp.asarray(ix1), jnp.asarray(ix2), jnp.asarray(pv))
        return np.asarray(jax.device_get(s))[:p]

    return score_fn


def eval_video_rel(score_fn, data_root, split="test"):
    """The FULL trained relation-detection pipeline on held-out videos,
    shared by both arms: GT boxes as per-frame detections (the reference's
    own eval setting — ``faster_rcnn_SGG_emb.py:583-587``) -> predicate
    scores from the arm's trained head -> per-frame top-100 tuples
    (``detection_output``, lib/utils.py:584-627) -> temporal association
    (lib/utils.py:461-526) -> vIoU-0.5 evaluate (lib/utils.py:375-458).
    Returns relation-detection mAP / R@50 / R@100 + tagging P@1/5/10 —
    the first TRAINED R@50 comparison (round-2 verdict item 2)."""
    from i2vsgg_tpu.data.roidb import combined_roidb
    from i2vsgg_tpu.data.pipeline import imread_bgr, prep_image
    from i2vsgg_tpu.video.association import association
    from i2vsgg_tpu.video.metrics import detection_output, evaluate
    cfg = _our_cfg()
    imdb, roidb, _, _ = combined_roidb(f"MVidVRD_{split}",
                                       use_flipped=False)
    frame_detections = {}
    for e in roidb:
        index = os.path.splitext(os.path.basename(e["image"]))[0]
        vid, fno = index.rsplit("_", 1)
        boxes0 = e["boxes"].astype(np.float64)
        classes = e["gt_classes"]
        n = len(boxes0)
        pairs = [(s, o) for s in range(n) for o in range(n) if s != o]
        tuples = []
        if n >= 2:
            im, scale = prep_image(imread_bgr(e["image"]), 240,
                                   cfg.PIXEL_MEANS)
            probs = score_fn(index, im, scale, boxes0 * scale, pairs)
            out = detection_output(
                probs, boxes0, classes, np.ones((n,), np.float32),
                np.asarray([p[0] for p in pairs]),
                np.asarray([p[1] for p in pairs]), top_k=100)
            if out is not None:
                rlp, tconfs, sboxes, oboxes, _ = out
                for t in range(len(tconfs)):
                    tuples.append([float(tconfs[t]),
                                   [int(c) for c in rlp[t]],
                                   [sboxes[t].tolist(), oboxes[t].tolist()],
                                   t])
        frame_detections.setdefault(vid, []).append([int(fno), tuples])
    vr = association(frame_detections)
    with open(os.path.join(os.environ["I2VSGG_DATA_ROOT"], "MVidVRD",
                           f"video_annotations_{split}.json")) as f:
        gt = json.load(f)
    mean_ap, rec_at_n, mprec_at_n = evaluate(vr, gt, verbose=False)
    return {"rel_mAP": mean_ap,
            "R@50": rec_at_n.get(50, 0.0), "R@100": rec_at_n.get(100, 0.0),
            "P@1": mprec_at_n.get(1, 0.0), "P@5": mprec_at_n.get(5, 0.0),
            "P@10": mprec_at_n.get(10, 0.0),
            "n_gt": int(sum(len(v) for v in gt.values()))}


def eval_sgg(score_fn):
    """Predicate top-1 accuracy + per-predicate AP over test-split GT
    pairs (the still-image analogue of relation recognition quality)."""
    data = _stage_b_data("test")
    correct = total = 0
    scores_all, labels_all = [], []
    for index, im, scale, boxes, classes, pairs, labels in data:
        s = score_fn(index, im, scale, boxes, pairs)
        for ii, lab in enumerate(labels):
            total += 1
            if lab[int(np.argmax(s[ii]))] > 0:
                correct += 1
            scores_all.append(s[ii])
            labels_all.append(lab)
    scores_all = np.stack(scores_all)
    labels_all = np.stack(labels_all)
    aps = []
    for r in range(N_REL):
        lab = labels_all[:, r]
        if lab.sum() == 0:
            continue
        order = np.argsort(-scores_all[:, r])
        tp = lab[order]
        rec = np.cumsum(tp) / lab.sum()
        prec = np.cumsum(tp) / (np.arange(len(tp)) + 1)
        aps.append(float(np.sum((rec[1:] - rec[:-1]) * prec[1:])
                         + rec[0] * prec[0]))
    return {"top1_acc": correct / max(total, 1),
            "pred_mAP": float(np.mean(aps)) if aps else 0.0,
            "n_pairs": total}


def _save_results(out, stage, results):
    """Read-modify-write under an fcntl lock: parity campaigns run the CPU
    (reference) and TPU (ours) lanes as concurrent processes writing
    different keys of the same JSON."""
    import fcntl
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, f"parity_{stage}.json")
    with open(os.path.join(out, ".results.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        prev = {}
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
        prev.update(results)
        with open(path, "w") as f:
            json.dump(prev, f, indent=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--data", default="")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seeds", default="0",
                    help="comma-separated run seeds, one full run per seed")
    ap.add_argument("--snaps", default="",
                    help="comma-separated intermediate eval steps (should "
                         "be epoch multiples so both arms align)")
    ap.add_argument("--n_source", type=int, default=48)
    ap.add_argument("--n_target", type=int, default=24)
    ap.add_argument("--n_frames", type=int, default=24)
    ap.add_argument("--hard_videos", action="store_true",
                    help="stage-c data: dense/fast videos so R@50 "
                         "de-saturates (see make_data)")
    ap.add_argument("--source_split", type=float, default=0.75)
    ap.add_argument("--target_split", type=float, default=0.75)
    ap.add_argument("--arm", default="both", choices=("ours", "ref", "both"))
    ap.add_argument("--stage", default="a",
                    help="any subset of 'abc' (c = Stage-B training + "
                         "video relation R@50 pipeline on held-out videos)")
    ap.add_argument("--skip_eval", action="store_true",
                    help="stage a: train + snapshot only (record ckpt "
                         "paths); a later --eval_only pass fills in mAP — "
                         "lets the CPU-bound reference arm train while "
                         "evals run on the TPU afterwards")
    ap.add_argument("--eval_only", action="store_true",
                    help="evaluate every stage-a entry's ckpts that have "
                         "no mAP recorded yet (backfills partially-"
                         "evaluated arms)")
    ap.add_argument("--eval_steps", default="",
                    help="with --eval_only: comma-separated ckpt steps to "
                         "evaluate (default all). Lets the campaign eval "
                         "the decision points (288 early-deficit probe + "
                         "final) first — a full 4-ckpt x 2-domain pass "
                         "costs ~2h on the 1-core box")
    args = ap.parse_args(argv)
    assert set(args.stage) <= set("abc") and args.stage

    import jax
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")
    # each eval_main call builds a fresh jit closure -> without the
    # persistent cache every checkpoint eval pays a full (remote) compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # the reference arm trains in full fp32 on CPU; on TPU our convs/matmuls
    # would otherwise run at the default bf16-ish matmul precision — a
    # systematic TRAINING-precision asymmetry between the arms (round-2
    # confound). Force fp32 accumulation everywhere for parity work.
    jax.config.update("jax_default_matmul_precision", "float32")

    data_root = args.data or os.path.join(args.out, "data")
    if not os.path.isdir(os.path.join(data_root, "MVRD")):
        make_data(data_root, n_source=args.n_source, n_target=args.n_target,
                  source_split=args.source_split,
                  target_split=args.target_split,
                  # Stage C needs real videos with trajectory GT; for it,
                  # n_target counts VIDEOS (x n_frames frames each)
                  video_target="c" in args.stage, n_frames=args.n_frames,
                  hard_videos=args.hard_videos)
        print(f"learnable dataset -> {data_root}")
    if "c" in args.stage:
        assert os.path.exists(os.path.join(
            data_root, "MVidVRD", "video_annotations_test.json")), \
            "stage c needs video-target data (delete the data dir to regen)"
    os.environ["I2VSGG_DATA_ROOT"] = data_root

    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
    snaps = tuple(int(s) for s in args.snaps.split(",") if s != "")
    results = {}

    def finish(stage, key, val):
        """Record + persist incrementally (runs take hours; a crash must
        not lose completed arms)."""
        results[key] = val
        _save_results(args.out, stage, {key: val, "steps": args.steps})
        print(f"{key}: {val}", flush=True)

    if args.eval_only:
        want = {s for s in args.eval_steps.split(",") if s}
        path = os.path.join(args.out, "parity_a.json")
        with open(path) as f:
            prev = json.load(f)
        for key, val in sorted(prev.items()):
            if not isinstance(val, dict) or "ckpts" not in val:
                continue
            done = val.get("mAP") or {}
            todo = [(s, p) for s, p in sorted(val["ckpts"].items(),
                                              key=lambda kv: int(kv[0]))
                    if s not in done and (not want or s in want)]
            if not todo:
                continue
            maps = dict(done)
            for s, p in todo:
                maps[str(s)] = {ds: eval_det(p, args.out, dataset=ds)
                                for ds in ("MVRD", "MVidVRD")}
                # persist per-ckpt: evals cost ~15 min each on CPU and the
                # round may end mid-sweep (re-read to keep concurrent keys)
                with open(path) as f:
                    cur = json.load(f).get(key, val)
                _save_results(args.out, "a",
                              {key: dict(cur, mAP=dict(sorted(
                                  maps.items(), key=lambda kv:
                                  int(kv[0]))))})
                print(f"{key}@{s}: {maps[s]}", flush=True)
        return prev

    arms = {"ours": ("ours",), "ref": ("ref",),
            "both": ("ours", "ref")}[args.arm]
    for seed in seeds:
        if "a" in args.stage:
            for arm in arms:
                t0 = time.time()
                if arm == "ours":
                    ckpt_dir = train_ours(data_root, args.out, args.steps,
                                          seed)
                    ckpts = ours_ckpts(ckpt_dir, set(snaps) | {args.steps})
                else:
                    ckpts = train_reference(data_root, args.out, args.steps,
                                            seed, snap_steps=snaps)
                train_s = round(time.time() - t0, 1)
                if args.skip_eval:
                    finish("a", f"{arm}_s{seed}",
                           {"ckpts": {str(s): p
                                      for s, p in sorted(ckpts.items())},
                            "mAP": {}, "train_s": train_s})
                    continue
                maps = {}
                for s, p in sorted(ckpts.items()):
                    maps[str(s)] = {
                        ds: eval_det(p, args.out, dataset=ds)
                        for ds in ("MVRD", "MVidVRD")}
                finish("a", f"{arm}_s{seed}",
                       {"mAP": maps, "train_s": train_s})
        if set("bc") & set(args.stage):
            for arm in arms:
                t0 = time.time()
                fn = (train_ours_sgg if arm == "ours"
                      else train_reference_sgg)(data_root, args.out,
                                                args.steps, seed)
                train_s = round(time.time() - t0, 1)
                if "b" in args.stage:
                    finish("b", f"{arm}_sgg_s{seed}",
                           dict(eval_sgg(fn), train_s=train_s))
                if "c" in args.stage:
                    finish("c", f"{arm}_video_s{seed}",
                           dict(eval_video_rel(fn, data_root),
                                train_s=train_s))

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
