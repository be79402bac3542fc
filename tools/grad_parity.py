#!/usr/bin/env python
"""Per-parameter GRADIENT parity between the torch reference and ours.

Forward values are parity-tested (tests/test_parity_reference.py), yet the
trained-quality gap persists — so the divergence must live in gradients,
sampling, or the optimizer. This tool removes the last nuisance variable:
with ``I2VSGG_DETERMINISTIC_SAMPLING=1`` (ours) and
``refshim.patch_deterministic_sampling()`` (reference) both arms take the
SAME anchor/roi samples, so per-parameter gradients on the same batch must
agree to float tolerance. Any layer whose gradient diverges names the
defective subsystem.

Usage:
  python tools/grad_parity.py [--out runs/parity_r3] [--batches 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

os.environ["I2VSGG_DETERMINISTIC_SAMPLING"] = "1"
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")


def torch_grads(sd_init, batches, classes, cfg_overrides):
    import torch
    from i2vsgg_tpu.parity.refshim import (build_reference_detector,
                                           patch_deterministic_sampling,
                                           reference_cfg)
    from tools.parity_run import HP

    cfg_t = reference_cfg()
    cfg_t.POOLING_MODE = "align"
    cfg_t.ANCHOR_SCALES = HP["anchor_scales"]
    cfg_t.ANCHOR_RATIOS = [0.5, 1, 2]
    cfg_t.TRAIN.RPN_PRE_NMS_TOP_N = 3000
    cfg_t.TRAIN.RPN_POST_NMS_TOP_N = 256
    cfg_t.TRAIN.RPN_POST_NMS_TOP_N_TARGET = 128
    patch_deterministic_sampling()

    ref = build_reference_detector(classes, depth=HP["depth"], ic=True,
                                   gc=True)
    ref.load_state_dict(sd_init)
    ref.train()

    def to_t(x):
        return torch.from_numpy(np.ascontiguousarray(x))

    # exact harness assembly [parity_run.train_reference / det_da_loss]:
    # loss_det + dloss_s_p + dloss_t_p + style_lambda*(d_s_style+d_t_style)
    ref.zero_grad()
    total = None
    for bs_, bt_ in batches:
        (_, _, _, rpn_c, rpn_b, rc_c, rc_b, _, d_i, d_s) = ref(
            to_t(bs_["image"].transpose(0, 3, 1, 2)), to_t(bs_["im_info"]),
            to_t(bs_["gt_boxes"]), to_t(bs_["num_boxes"].astype(np.int64)),
            target=False, eta=HP["eta"], eta_style=HP["eta_style"])
        d_i_t, d_s_t = ref(
            to_t(bt_["image"].transpose(0, 3, 1, 2)), to_t(bt_["im_info"]),
            torch.zeros(1, 1, 5), torch.zeros(1, dtype=torch.int64),
            target=True, eta=HP["eta"], eta_style=HP["eta_style"])
        loss = (rpn_c.mean() + rpn_b.mean() + rc_c.mean() + rc_b.mean()
                + 0.5 * torch.mean(d_i ** 2)
                + 0.5 * torch.mean((1 - d_i_t) ** 2)
                + HP["style_lambda"] * (0.5 * torch.mean(d_s ** 2)
                                        + 0.5 * torch.mean((1 - d_s_t) ** 2)))
        total = loss if total is None else total + loss
    total.backward()
    grads = {}
    for k, p in ref.named_parameters():
        grads[k] = (p.grad.detach().numpy().astype(np.float64)
                    if p.grad is not None else None)
    return grads


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r3")
    ap.add_argument("--batches", type=int, default=1)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import torch

    from tools.parity_run import (_loaders, _our_cfg, shared_init, HP,
                                  CFG_OVERRIDES)
    data_root = os.path.join(args.out, "data")
    os.environ["I2VSGG_DATA_ROOT"] = data_root
    cfg = _our_cfg()
    imdb_s, ls, lt = _loaders(cfg, 1)
    batches = [(next(iter(ls)), next(iter(lt)))
               for _ in range(args.batches)]

    sd = torch.load(shared_init(data_root, args.out), weights_only=True)

    # ---- torch arm -----------------------------------------------------
    tg = torch_grads(sd, batches, tuple(imdb_s.classes), CFG_OVERRIDES)

    # convert grads through the (linear) jwyang layout map: zero grads for
    # missing (frozen) params so the map sees a complete state_dict
    from i2vsgg_tpu.utils.torch_import import (jwyang_detector_params,
                                               merge_imported)
    sd_g = {}
    for k, v in sd.items():
        g = tg.get(k)
        sd_g[k] = (torch.from_numpy(g) if g is not None
                   else torch.zeros_like(v))
    ref_gtree = jwyang_detector_params(
        {k: v.double() for k, v in sd_g.items()}, HP["depth"])

    # ---- our arm -------------------------------------------------------
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.train.det_da import det_da_loss

    model = FasterRCNN_DA(num_classes=len(imdb_s.classes), cfg=cfg,
                          backbone=f"res{HP['depth']}", ic=True, gc=True)
    init = dict(model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 240, 320, 3)),
        jnp.asarray([[240, 320, 1.0]]), mode="inference")["params"])
    init["netD_pixel"] = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 240, 320, 3)),
        jnp.asarray([[240, 320, 1.0]]),
        mode="target")["params"]["netD_pixel"]
    params = merge_imported(init, jwyang_detector_params(sd, HP["depth"]))

    def loss_fn(p):
        total = 0.0
        for i, (bs_, bt_) in enumerate(batches):
            batch_s = {"image": jnp.asarray(bs_["image"]),
                       "im_info": jnp.asarray(bs_["im_info"]),
                       "gt_boxes": jnp.asarray(bs_["gt_boxes"])}
            batch_t = {"image": jnp.asarray(bt_["image"]),
                       "im_info": jnp.asarray(bt_["im_info"])}
            k = jax.random.PRNGKey(7 + i)
            k1, k2, k3 = jax.random.split(k, 3)
            l, _ = det_da_loss(p, model, batch_s, batch_t,
                               {"sampling": k1, "sampling2": k2,
                                "dropout": k3},
                               eta=HP["eta"], eta_style=HP["eta_style"],
                               style_lambda=HP["style_lambda"], cr=False)
            total = total + l
        return total

    og = jax.jit(jax.grad(loss_fn))(params)

    # ---- compare -------------------------------------------------------
    rows = []

    def walk(ref_t, our_t, path):
        if isinstance(ref_t, dict):
            for k in ref_t:
                if k in our_t:
                    walk(ref_t[k], our_t[k], path + "/" + k)
            return
        a = np.asarray(ref_t, np.float64).ravel()
        b = np.asarray(our_t, np.float64).ravel()
        if a.shape != b.shape:
            rows.append((path, float("nan"), float("nan"), "SHAPE"))
            return
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = float(a @ b / (na * nb)) if na > 0 and nb > 0 else \
            (1.0 if na == nb else 0.0)
        rel = float(np.linalg.norm(a - b) / max(na, 1e-12))
        rows.append((path, cos, rel, f"|ref|={na:.3e} |ours|={nb:.3e}"))

    walk(ref_gtree, og, "")
    rows.sort(key=lambda r: (np.nan_to_num(r[1], nan=-2.0)))
    print(f"{'cos':>8} {'rel':>10}  param  (worst {args.top} first)")
    for path, cos, rel, note in rows[:args.top]:
        print(f"{cos:8.4f} {rel:10.3e}  {path}  {note}")
    good = sum(1 for r in rows if r[1] > 0.999)
    print(f"\n{good}/{len(rows)} params with cos>0.999")


if __name__ == "__main__":
    main()
