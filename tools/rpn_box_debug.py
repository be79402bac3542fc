#!/usr/bin/env python
"""Bisect the RPN bbox-branch gradient divergence named by grad_parity.py.

grad_parity (round 4) shows rpn/cls_score grads matching to 1e-7 while
rpn/bbox_pred grads are ~10x larger in ours with cos ~0.1 — same sampled
anchors, diverging box branch. This script compares, elementwise, the
anchor-target intermediates of both arms on one deterministic batch:
labels, bbox_targets, inside/outside weights, and d(loss_box)/d(bbox_pred).

Usage: python tools/rpn_box_debug.py [--out runs/parity_r3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

os.environ["I2VSGG_DETERMINISTIC_SAMPLING"] = "1"
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r3")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import torch

    from tools.parity_run import _loaders, _our_cfg, HP
    data_root = os.path.join(args.out, "data")
    os.environ["I2VSGG_DATA_ROOT"] = data_root
    cfg = _our_cfg()
    _, ls, _ = _loaders(cfg, 1)
    bs_ = next(iter(ls))

    gt = bs_["gt_boxes"]
    info = bs_["im_info"]
    h_im, w_im = int(info[0, 0]), int(info[0, 1])
    hf, wf = h_im // 16, w_im // 16
    print(f"image {h_im}x{w_im} fmap {hf}x{wf} "
          f"n_gt={int(bs_['num_boxes'][0])}")

    # ---- reference arm ---------------------------------------------------
    from i2vsgg_tpu.parity.refshim import (install_reference_shims,
                                           patch_deterministic_sampling,
                                           reference_cfg)
    install_reference_shims()
    patch_deterministic_sampling()
    cfg_t = reference_cfg()
    cfg_t.ANCHOR_SCALES = HP["anchor_scales"]
    cfg_t.ANCHOR_RATIOS = [0.5, 1, 2]
    from model.rpn.anchor_target_layer import _AnchorTargetLayer

    layer = _AnchorTargetLayer(16, cfg_t.ANCHOR_SCALES, cfg_t.ANCHOR_RATIOS)
    a = len(cfg_t.ANCHOR_SCALES) * 3
    fake_score = torch.zeros(1, 2 * a, hf, wf)
    t_gt = torch.from_numpy(np.ascontiguousarray(gt))
    t_info = torch.from_numpy(np.ascontiguousarray(info))
    t_nb = torch.from_numpy(bs_["num_boxes"].astype(np.int64))
    r_lab, r_tgt, r_in, r_out = layer(
        (fake_score, t_gt, t_info, t_nb))
    # reference layouts: labels (1, 1, A*hf, wf); rest (1, 4A, hf, wf)
    r_lab = r_lab.view(1, a, hf, wf).permute(0, 2, 3, 1).numpy().reshape(-1)
    def chw(x):   # (1, 4A, h, w) -> (N, 4) in (H, W, A) anchor order
        return (x.view(1, a, 4, hf, wf).permute(0, 3, 4, 1, 2)
                .contiguous().numpy().reshape(-1, 4))
    r_tgt, r_in, r_out = chw(r_tgt), chw(r_in), chw(r_out)

    # ---- our arm ---------------------------------------------------------
    from i2vsgg_tpu.models.targets import anchor_targets
    from i2vsgg_tpu.ops.anchors import shifted_anchors, generate_anchors

    base = generate_anchors(scales=np.asarray(cfg.ANCHOR_SCALES),
                            ratios=np.asarray(cfg.ANCHOR_RATIOS))
    anchors = shifted_anchors(hf, wf, cfg.FEAT_STRIDE[0], base)
    at = anchor_targets(
        jax.random.PRNGKey(0), anchors, jnp.asarray(gt[0]),
        jnp.asarray(info[0]),
        positive_overlap=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
        negative_overlap=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
        clobber_positives=cfg.TRAIN.RPN_CLOBBER_POSITIVES,
        fg_fraction=cfg.TRAIN.RPN_FG_FRACTION,
        batch_size=cfg.TRAIN.RPN_BATCHSIZE)
    o_lab = np.asarray(at.labels)
    o_tgt = np.asarray(at.bbox_targets)
    o_in = np.broadcast_to(np.asarray(at.inside_weights)[:, None], (len(o_lab), 4))
    o_out = np.broadcast_to(np.asarray(at.outside_weights)[:, None], (len(o_lab), 4))

    def cmp(name, rv, ov, mask=None):
        rv, ov = np.asarray(rv, np.float64), np.asarray(ov, np.float64)
        if mask is not None:
            rv = rv[mask]
            ov = ov[mask]
        d = np.abs(rv - ov)
        print(f"{name:18s} max|diff| {d.max():.3e}  "
              f"n_diff(>1e-5) {(d > 1e-5).sum():5d}/{d.size}  "
              f"|ref| {np.linalg.norm(rv):.3e} |ours| {np.linalg.norm(ov):.3e}")
        return d

    print("\n== anchor-target intermediates (anchor order H,W,A) ==")
    cmp("labels", r_lab, o_lab)
    pos = (r_lab == 1)
    print(f"positives: ref {int((r_lab == 1).sum())} ours "
          f"{int((o_lab == 1).sum())}; labeled: ref "
          f"{int((r_lab >= 0).sum())} ours {int((o_lab >= 0).sum())}")
    cmp("inside_w[pos]", r_in, o_in, pos)
    cmp("outside_w[lab]", r_out, o_out, (r_lab >= 0))
    cmp("outside_w[ALL]", r_out, o_out)
    dt = cmp("bbox_tgt[pos]", r_tgt, o_tgt, pos)
    cmp("bbox_tgt[ALL]", r_tgt, o_tgt)
    if (dt > 1e-5).any():
        bad = np.nonzero(pos)[0][np.nonzero(
            np.abs(r_tgt[pos] - o_tgt[pos]).max(1) > 1e-5)[0][:5]]
        for i in bad:
            print(f"  anchor {i}: ref tgt {r_tgt[i]} ours {o_tgt[i]} "
                  f"anchor box {np.asarray(anchors[i])}")

    # ---- loss + grad wrt pred -------------------------------------------
    from i2vsgg_tpu.ops.boxes import smooth_l1_loss
    rng = np.random.RandomState(5)
    pred = rng.randn(len(o_lab), 4).astype(np.float32) * 0.1

    def our_loss(p):
        return smooth_l1_loss(p[None], jnp.asarray(o_tgt)[None],
                              jnp.asarray(at.inside_weights)[None, :, None],
                              jnp.asarray(at.outside_weights)[None, :, None],
                              sigma=3.0, reduce_dims=(-1, -2))

    og = np.asarray(jax.grad(lambda p: our_loss(p))(jnp.asarray(pred)))
    ol = float(our_loss(jnp.asarray(pred)))

    from model.utils.net_utils import _smooth_l1_loss as ref_sl1
    tp = torch.from_numpy(pred).requires_grad_(True)
    rl = ref_sl1(tp, torch.from_numpy(r_tgt.astype(np.float32)),
                 torch.from_numpy(r_in.astype(np.float32)),
                 torch.from_numpy(r_out.astype(np.float32)),
                 sigma=3, dim=[0, 1])
    rl.backward()
    rg = tp.grad.numpy()
    print(f"\nloss_box: ref {float(rl):.6f} ours {ol:.6f}")
    cmp("dloss/dpred", rg, og)
    na, nb = np.linalg.norm(rg), np.linalg.norm(og)
    print(f"grad cos {float((rg.ravel() @ og.ravel()) / (na * nb)):.4f}")


if __name__ == "__main__":
    main()
