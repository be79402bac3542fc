"""Make the PyTorch reference importable and runnable on CPU.

Injects into ``sys.modules`` BEFORE any reference import:

* ``easydict`` — minimal EasyDict (attribute-dict), enough for
  ``lib/model/utils/config.py``.
* ``torchvision``/``torchvision.models`` — empty stubs (the reference
  imports them but the styleD detector builds its own ResNet classes,
  ``resnet_instance_styleD_bilinear.py:148-334``).
* ``model.roi_align.modules.roi_align`` — pure-torch ``RoIAlignAvg`` with
  the reference CUDA kernel's exact single-tap semantics
  (``roi_align_kernel.cu:15-73`` — bin = (roi+1)/(aligned-1), one bilinear
  tap per cell, hstart = min(floor(h), H-2), zero outside; then 2x2
  stride-1 avg pool). Mirrors ``i2vsgg_tpu/ops/roi_align.py`` (which is
  golden-tested against the same .cu math).
* ``model.roi_pooling.modules.roi_pool`` — pure-torch max RoIPool
  (round() quantization, floor/ceil bins, empty bins 0), mirroring
  ``i2vsgg_tpu/ops/roi_pool.py``.
* ``model.roi_crop.modules.roi_crop`` — inert stub (crop branches are
  commented out upstream, faster_rcnn_instance_styleD_bilinear.py:105-114).

After installation, ``from model.faster_rcnn.resnet_instance_styleD_bilinear
import resnet`` works against ``$I2VSGG_REFERENCE/lib`` (default
``/root/reference/lib``).
"""

from __future__ import annotations

import os
import sys
import types

_installed = False


def reference_root() -> str:
    return os.environ.get("I2VSGG_REFERENCE", "/root/reference")


def install_reference_shims() -> None:
    """Idempotently register shims + put the reference's lib/ on sys.path."""
    global _installed
    if _installed:
        return
    import numpy as np
    import torch

    lib = os.path.join(reference_root(), "lib")
    if lib not in sys.path:
        sys.path.insert(0, lib)

    # ---- easydict ------------------------------------------------------
    if "easydict" not in sys.modules:
        class EasyDict(dict):
            def __init__(self, d=None, **kw):
                super().__init__()
                d = dict(d or {}, **kw)
                for k, v in d.items():
                    setattr(self, k, v)

            def __setattr__(self, name, value):
                if isinstance(value, dict) and not isinstance(value, EasyDict):
                    value = EasyDict(value)
                super().__setattr__(name, value)
                self[name] = value

            def __setitem__(self, name, value):
                super().__setitem__(name, value)
                super().__setattr__(name, value)

            __getattr__ = dict.__getitem__

        m = types.ModuleType("easydict")
        m.EasyDict = EasyDict
        sys.modules["easydict"] = m

    # ---- torchvision stub ---------------------------------------------
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm

    # ---- pure-torch RoIAlign (single-tap reference semantics) ---------
    def _axis_weights(lo, bins, n_out, size, dtype):
        """Per-roi 1-D bilinear interpolation matrices (R, n_out, size):
        row ph holds (1-frac) at min(floor(pos), size-2) and frac at the
        next cell, zeroed when pos is outside [0, size) — exactly the
        per-axis factor of the kernel's single bilinear tap."""
        pos = (torch.arange(n_out, dtype=dtype)[None, :] * bins[:, None]
               + lo[:, None])                                    # (R, n_out)
        inside = ((pos >= 0) & (pos < size)).to(dtype)
        start = torch.minimum(torch.floor(pos),
                              torch.tensor(size - 2.0, dtype=dtype))
        frac = pos - start
        idx = start.long().clamp(0, size - 2)
        wm = torch.zeros(lo.shape[0], n_out, size, dtype=dtype)
        wm.scatter_(2, idx[:, :, None], ((1 - frac) * inside)[:, :, None])
        wm.scatter_add_(2, (idx + 1)[:, :, None],
                        (frac * inside)[:, :, None])
        return wm

    def roi_align_forward(features, rois, ah, aw, scale):
        """features (B, C, H, W), rois (R, 5) -> (R, C, ah, aw).

        Separable formulation: out[r] = Wy[r] @ f[bi_r] @ Wx[r]^T — the
        bilinear tap factorizes exactly into per-axis weights, so this is
        the same math as the gather form (roi_align_forward_gather below)
        at ~100x less memory traffic, which is what makes CPU parity
        training runs affordable (equivalence-tested)."""
        b, c, h, w = features.shape
        dt = features.dtype
        bi = rois[:, 0].long()
        x1 = rois[:, 1] * scale
        y1 = rois[:, 2] * scale
        bin_w = (rois[:, 3] * scale - x1 + 1.0).clamp(min=0) / (aw - 1.0)
        bin_h = (rois[:, 4] * scale - y1 + 1.0).clamp(min=0) / (ah - 1.0)
        wy = _axis_weights(y1, bin_h, ah, h, dt)                 # (R,AH,H)
        wx = _axis_weights(x1, bin_w, aw, w, dt)                 # (R,AW,W)
        outs = torch.empty(rois.shape[0], c, ah, aw, dtype=dt)
        for img in torch.unique(bi):                     # B is 1-2 here
            sel = bi == img
            f = features[img]                                    # (C,H,W)
            t = torch.einsum("rph,chw->rcpw", wy[sel], f)
            outs[sel] = torch.einsum("rcpw,rqw->rcpq", t, wx[sel])
        return outs

    def roi_align_forward_gather(features, rois, ah, aw, scale):
        """The direct (gather) form of the same kernel math; kept as the
        equivalence oracle for roi_align_forward (tests/test_refshim_ops)."""
        b, c, h, w = features.shape
        r = rois.shape[0]
        bi = rois[:, 0].long()
        x1 = rois[:, 1] * scale
        y1 = rois[:, 2] * scale
        x2 = rois[:, 3] * scale
        y2 = rois[:, 4] * scale
        bin_w = (x2 - x1 + 1.0).clamp(min=0) / (aw - 1.0)
        bin_h = (y2 - y1 + 1.0).clamp(min=0) / (ah - 1.0)
        ph = torch.arange(ah, dtype=features.dtype)
        pw = torch.arange(aw, dtype=features.dtype)
        ys = ph[None, :] * bin_h[:, None] + y1[:, None]          # (R, AH)
        xs = pw[None, :] * bin_w[:, None] + x1[:, None]          # (R, AW)
        inside_y = (ys >= 0) & (ys < h)
        inside_x = (xs >= 0) & (xs < w)
        hstart = torch.minimum(torch.floor(ys),
                               torch.tensor(h - 2.0, dtype=ys.dtype))
        wstart = torch.minimum(torch.floor(xs),
                               torch.tensor(w - 2.0, dtype=xs.dtype))
        hr = (ys - hstart)[:, None, :, None]                     # (R,1,AH,1)
        wr = (xs - wstart)[:, None, None, :]                     # (R,1,1,AW)
        hs = hstart.long().clamp(0, h - 2)
        ws = wstart.long().clamp(0, w - 2)
        f = features[bi]                                         # (R,C,H,W)
        yi = hs[:, None, :, None].expand(r, c, ah, aw)
        xi = ws[:, None, None, :].expand(r, c, ah, aw)
        flat = f.reshape(r, c, h * w)
        g = lambda yy, xx: torch.gather(flat, 2,
                                        (yy * w + xx).reshape(r, c, -1)
                                        ).reshape(r, c, ah, aw)
        ul = g(yi, xi)
        ur = g(yi, xi + 1)
        dl = g(yi + 1, xi)
        dr = g(yi + 1, xi + 1)
        out = (ul * (1 - hr) * (1 - wr) + ur * (1 - hr) * wr
               + dl * hr * (1 - wr) + dr * hr * wr)
        inside = (inside_y[:, None, :, None]
                  & inside_x[:, None, None, :]).to(out.dtype)
        return out * inside

    class RoIAlignAvg(torch.nn.Module):
        def __init__(self, aligned_height, aligned_width, spatial_scale):
            super().__init__()
            self.ah = int(aligned_height)
            self.aw = int(aligned_width)
            self.scale = float(spatial_scale)

        def forward(self, features, rois):
            x = roi_align_forward(features, rois, self.ah + 1, self.aw + 1,
                                  self.scale)
            return torch.nn.functional.avg_pool2d(x, kernel_size=2, stride=1)

    class RoIAlign(torch.nn.Module):
        def __init__(self, aligned_height, aligned_width, spatial_scale):
            super().__init__()
            self.ah = int(aligned_height)
            self.aw = int(aligned_width)
            self.scale = float(spatial_scale)

        def forward(self, features, rois):
            return roi_align_forward(features, rois, self.ah, self.aw,
                                     self.scale)

    ra = types.ModuleType("model.roi_align.modules.roi_align")
    ra.RoIAlignAvg = RoIAlignAvg
    ra.RoIAlign = RoIAlign
    ra.roi_align_forward = roi_align_forward
    ra.roi_align_forward_gather = roi_align_forward_gather

    # ---- pure-torch max RoIPool (vectorized masked row/col max sweeps,
    # the same separable formulation as i2vsgg_tpu/ops/roi_pool.py) -------
    class _RoIPooling(torch.nn.Module):
        def __init__(self, pooled_height, pooled_width, spatial_scale):
            super().__init__()
            self.ph = int(pooled_height)
            self.pw = int(pooled_width)
            self.scale = float(spatial_scale)

        def forward(self, features, rois):
            b, c, h, w = features.shape
            r = rois.shape[0]
            ph, pw = self.ph, self.pw
            neg = torch.finfo(features.dtype).min
            start_w = torch.round(rois[:, 1] * self.scale).long()
            start_h = torch.round(rois[:, 2] * self.scale).long()
            end_w = torch.round(rois[:, 3] * self.scale).long()
            end_h = torch.round(rois[:, 4] * self.scale).long()
            rw = (end_w - start_w + 1).clamp(min=1)
            rh = (end_h - start_h + 1).clamp(min=1)
            p = torch.arange(ph)
            q = torch.arange(pw)
            hs = (torch.div(p[None] * rh[:, None], ph,
                            rounding_mode="floor") + start_h[:, None]
                  ).clamp(0, h)
            he = (-torch.div(-(p[None] + 1) * rh[:, None], ph,
                             rounding_mode="floor") + start_h[:, None]
                  ).clamp(0, h)
            ws_ = (torch.div(q[None] * rw[:, None], pw,
                             rounding_mode="floor") + start_w[:, None]
                   ).clamp(0, w)
            we = (-torch.div(-(q[None] + 1) * rw[:, None], pw,
                             rounding_mode="floor") + start_w[:, None]
                  ).clamp(0, w)
            hh = torch.arange(h)
            ww = torch.arange(w)
            row_m = (hh[None, None, :] >= hs[:, :, None]) & \
                    (hh[None, None, :] < he[:, :, None])       # (R, PH, H)
            col_m = (ww[None, None, :] >= ws_[:, :, None]) & \
                    (ww[None, None, :] < we[:, :, None])       # (R, PW, W)
            f = features[rois[:, 0].long()]                    # (R, C, H, W)
            rows = torch.where(row_m[:, None, :, :, None], f[:, :, None],
                               torch.tensor(neg)).amax(dim=3)  # (R,C,PH,W)
            out = torch.where(col_m[:, None, None, :, :],
                              rows[:, :, :, None, :],
                              torch.tensor(neg)).amax(dim=4)   # (R,C,PH,PW)
            empty = (he <= hs)[:, :, None] | (we <= ws_)[:, None, :]
            return torch.where(empty[:, None], torch.tensor(0.0), out)

    rp = types.ModuleType("model.roi_pooling.modules.roi_pool")
    rp._RoIPooling = _RoIPooling

    class _RoICrop(torch.nn.Module):          # dead upstream; inert
        def forward(self, *a, **k):
            raise NotImplementedError("roi_crop is dead code upstream")

    rc = types.ModuleType("model.roi_crop.modules.roi_crop")
    rc._RoICrop = _RoICrop

    # ---- model.roi_layers (detectron2-style bindings over missing
    # model._C, SURVEY.md §8.8) — ROIPool is the only op on live SGG paths
    # (resnet_SGG_emb.py:82); ROIAlign raises if something dead-code ever
    # calls it ---------------------------------------------------------
    class ROIPool(torch.nn.Module):
        def __init__(self, output_size, spatial_scale):
            super().__init__()
            ph, pw = output_size
            self._impl = _RoIPooling(ph, pw, spatial_scale)

        def forward(self, features, rois):
            return self._impl(features, rois)

    class ROIAlignLayer(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            raise NotImplementedError(
                "roi_layers.ROIAlign is not on a live reference path")

    rl = types.ModuleType("model.roi_layers")
    rl.__path__ = [os.path.join(lib, "model", "roi_layers")]
    rl.ROIPool = ROIPool
    rl.ROIAlign = ROIAlignLayer

    def _nms_shim(dets, scores, thresh):
        from model.nms.nms_cpu import nms_cpu
        d = torch.cat([dets, scores[:, None]], dim=1)
        return torch.from_numpy(np.asarray(nms_cpu(d, thresh)))

    rl.nms = _nms_shim

    # parent packages must exist as (namespace) modules for the dotted
    # imports to resolve to our leaves
    for name, leaf in [("model.roi_align.modules.roi_align", ra),
                       ("model.roi_pooling.modules.roi_pool", rp),
                       ("model.roi_crop.modules.roi_crop", rc),
                       ("model.roi_layers", rl)]:
        parts = name.split(".")
        for i in range(1, len(parts)):
            pkg = ".".join(parts[:i])
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = [os.path.join(lib, *parts[:i])]
                sys.modules[pkg] = m
        sys.modules[name] = leaf

    _installed = True


def _patch_torch2_compat():
    """The reference targets torch 0.4; patch the handful of APIs that
    behave differently under torch 2.x WITHOUT touching the reference tree.
    Each patch preserves semantics exactly."""
    import torch
    from model.rpn import rpn as rpn_mod

    # torch-2 .view refuses non-contiguous inputs that 0.4 accepted
    def _reshape(x, d):
        s = x.size()
        return x.reshape(s[0], int(d),
                         int(float(s[1] * s[2]) / float(d)), s[3])

    rpn_mod._RPN.reshape = staticmethod(_reshape)


def patch_deterministic_sampling():
    """Derandomize the reference's anchor/proposal subsampling so its
    gradients are directly comparable with ours under
    ``I2VSGG_DETERMINISTIC_SAMPLING=1`` (tools/grad_parity.py).

    Call-site semantics differ, so the fake ``np.random.permutation``
    inspects its caller:
    * anchor_target_layer.py:131,143 DISABLES ``perm[:n-k]`` — a REVERSED
      arange makes it disable the last n-k, keeping the FIRST k;
    * proposal_target_layer_cascade.py:158 KEEPS ``perm[:k]`` — a plain
      arange keeps the FIRST k.
    Both then match our first-k-in-index-order rule. ``np.random.rand(k)``
    (with-replacement draws, proposal_target:167-182) becomes
    ``(arange(k)+0.5)/k`` so ``floor(rand*n)`` equals our deterministic
    draw formula."""
    import sys

    import numpy as _np

    real_perm = _np.random.permutation
    real_rand = _np.random.rand

    def fake_permutation(n):
        caller = sys._getframe(1).f_code.co_filename
        if "anchor_target" in caller:
            return _np.arange(n)[::-1].copy()
        return _np.arange(n)

    def fake_rand(*shape):
        if len(shape) == 1:
            k = shape[0]
            return (_np.arange(k) + 0.5) / max(k, 1)
        return real_rand(*shape)

    _np.random.permutation = fake_permutation
    _np.random.rand = fake_rand
    return real_perm, real_rand


def patch_cuda_noop():
    """Make ``.cuda()`` a no-op: the reference's SGG code calls it
    unconditionally (``resnet_SGG_emb.py:130-142``); CPU-only parity runs
    keep everything on host."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def reference_cfg():
    """The reference's global cfg (easydict) after shim install."""
    install_reference_shims()
    from model.utils.config import cfg
    return cfg


def build_reference_detector(classes, depth=101, ic=True, gc=True,
                             class_agnostic=False):
    """Instantiate the reference styleD detector on CPU (random init,
    pretrained=False so no weight files are needed)."""
    install_reference_shims()
    _patch_torch2_compat()
    from model.faster_rcnn.resnet_instance_styleD_bilinear import resnet
    model = resnet(classes, depth, pretrained=False,
                   class_agnostic=class_agnostic, ic=ic, gc=gc)
    model.create_architecture()
    model.eval()
    return model
