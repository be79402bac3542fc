"""jwyang-layout checkpoint import: value parity of every mapped component.

The reference's own checkpoints use the jwyang/faster-rcnn.pytorch naming
(RCNN_base Sequential, RCNN_rpn.RPN_*, RCNN_cls_score/RCNN_bbox_pred,
netD_*, vrd.* — resnet_instance_styleD_bilinear.py:368-379,
resnet_SGG_emb.py:64-130). Each test builds a torch replica with that exact
naming, exports its state dict, imports via utils.torch_import, and compares
module outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_torch_import import TorchBottleneck, build_torch_trunk
from tests.test_roi_ops import np_roi_pool

from i2vsgg_tpu.models.backbones import ResNetTrunk, RESNET_STAGES
from i2vsgg_tpu.models.discriminators import NetDPixel, NetDStyle
from i2vsgg_tpu.models.rpn import RPNHead
from i2vsgg_tpu.models.sgg import VRDHead
from i2vsgg_tpu.utils.torch_import import (jwyang_detector_params,
                                           jwyang_trunk_params,
                                           jwyang_vrd_params,
                                           merge_imported)

DEPTH = 10


def randomize_bn(module):
    with torch.no_grad():
        for mod in module.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.3)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
                mod.weight.copy_(torch.randn_like(mod.weight) * 0.2 + 1.0)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)


def build_jwyang_base(depth):
    """RCNN_base as the reference assembles it (Sequential indices 0-6)."""
    t = build_torch_trunk(depth)
    return tnn.Sequential(t.conv1, t.bn1, t.relu, t.maxpool,
                          t.layer1, t.layer2, t.layer3)


def test_jwyang_trunk_naming(rng):
    base = build_jwyang_base(DEPTH)
    randomize_bn(base)
    base.eval()
    sd = {f"RCNN_base.{k}": v for k, v in base.state_dict().items()}
    x = rng.randn(1, 3, 64, 80).astype(np.float32)
    with torch.no_grad():
        ref = base(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    params = jwyang_trunk_params(sd, DEPTH)
    trunk = ResNetTrunk(depth=DEPTH, dtype=jnp.float32)
    feat, _ = trunk.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat), ref, atol=2e-4)


def test_jwyang_rpn_head_import(rng):
    a = 9
    rpn = tnn.Module()
    rpn.RPN_Conv = tnn.Conv2d(1024, 512, 3, 1, 1)
    rpn.RPN_cls_score = tnn.Conv2d(512, 2 * a, 1)
    rpn.RPN_bbox_pred = tnn.Conv2d(512, 4 * a, 1)
    sd = {f"RCNN_rpn.{k}": v for k, v in rpn.state_dict().items()}

    x = rng.randn(1, 1024, 6, 8).astype(np.float32) * 0.1
    with torch.no_grad():
        h = F.relu(rpn.RPN_Conv(torch.from_numpy(x)))
        ref_cls = rpn.RPN_cls_score(h).numpy().transpose(0, 2, 3, 1)
        ref_box = rpn.RPN_bbox_pred(h).numpy().transpose(0, 2, 3, 1)

    head = RPNHead(num_anchors=a, dtype=jnp.float32)
    init = head.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 6, 8, 1024)))["params"]
    imported = jwyang_detector_params(sd, DEPTH)
    params = merge_imported({"rpn": init}, imported)["rpn"]
    cls, box = head.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(cls), ref_cls, atol=1e-4)
    np.testing.assert_allclose(np.asarray(box), ref_box, atol=1e-4)


class TorchNetDPixel(tnn.Module):
    """[resnet_instance_styleD_bilinear.py:38-83]"""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(1024, 512, 1, bias=False)
        self.conv2 = tnn.Conv2d(512, 128, 1, bias=False)
        self.conv3 = tnn.Conv2d(128, 1, 1, bias=False)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        feat = F.avg_pool2d(x, (x.size(2), x.size(3)))
        return torch.sigmoid(self.conv3(x)), feat


class TorchNetDStyle(tnn.Module):
    """[resnet_instance_styleD_bilinear.py:85-146]"""

    def __init__(self, dim=512, rank=5):
        super().__init__()
        self.dim, self.rank = dim, rank
        self.fc_1 = tnn.Linear(512, dim * rank)
        self.fc_2 = tnn.Linear(512, dim * rank)
        self.fc1 = tnn.Linear(dim, 1)

    def forward(self, x):
        b, c, w, h = x.shape
        x = x.reshape(b, c, -1).permute(0, 2, 1)
        z = self.fc_1(x) * self.fc_2(x)
        z = torch.sum(z.reshape(b, w * h, self.dim, self.rank), dim=-1)
        z = torch.sum(z, dim=1)
        z = torch.sqrt(F.relu(z)) - torch.sqrt(F.relu(-z))
        z = F.normalize(z, p=2, dim=1)
        return torch.sigmoid(self.fc1(z)), z


def test_jwyang_discriminator_import(rng):
    tp = TorchNetDPixel()
    ts = TorchNetDStyle()
    sd = {f"netD_pixel.{k}": v for k, v in tp.state_dict().items()}
    sd.update({f"netD_style.{k}": v for k, v in ts.state_dict().items()})
    imported = jwyang_detector_params(sd, DEPTH)

    xp = rng.randn(3, 1024, 7, 7).astype(np.float32) * 0.2
    xs = rng.randn(2, 512, 6, 8).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_p, ref_pf = tp(torch.from_numpy(xp))
        ref_s, ref_sf = ts(torch.from_numpy(xs))

    dp = NetDPixel(context=True, dtype=jnp.float32)
    init_p = dp.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 7, 7, 1024)))["params"]
    params_p = merge_imported(init_p, imported["netD_pixel"])
    out_p, feat_p = dp.apply({"params": params_p},
                             jnp.asarray(xp.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out_p)[..., 0],
                               ref_p.numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_p),
                               ref_pf.numpy()[:, :, 0, 0], atol=1e-5)

    ds = NetDStyle(context=True, dtype=jnp.float32)
    init_s = ds.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 6, 8, 512)))["params"]
    params_s = merge_imported(init_s, imported["netD_style"])
    out_s, feat_s = ds.apply({"params": params_s},
                             jnp.asarray(xs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out_s), ref_s.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_s), ref_sf.numpy(), atol=1e-5)


class TorchVRD(tnn.Module):
    """Post-pool vrd replica with jwyang naming (FC wrappers contain `.fc`,
    conv tower wrappers contain `.conv`) [resnet_SGG_emb.py:64-221]."""

    def __init__(self, c, pool, fc_dim, emb_dim):
        super().__init__()

        def fcwrap(i, o):
            m = tnn.Module()
            m.fc = tnn.Linear(i, o)
            return m

        def convwrap(i, o, k, stride=1, pad=0):
            m = tnn.Module()
            m.conv = tnn.Conv2d(i, o, k, stride, pad)
            return m

        self.fc6 = fcwrap(c * pool * pool, fc_dim)
        self.fc7 = fcwrap(fc_dim, fc_dim)
        self.so_vis_embeddings = fcwrap(fc_dim, emb_dim)
        self.fc8 = fcwrap(fc_dim, 256)
        self.fc_so = fcwrap(emb_dim * 2, 256)
        self.conv_lo = tnn.Sequential(convwrap(2, 96, 5, 2, 2),
                                      convwrap(96, 128, 5, 2, 2),
                                      convwrap(128, 64, 8, 1, 0))
        self.fc_lov = fcwrap(64, 256)
        self.fc_fusion = fcwrap(256 * 3, 256)
        self.fc_rel = fcwrap(256, emb_dim)
        self.prd_sem_embeddings = tnn.Sequential(
            tnn.Linear(300, 1024), tnn.LeakyReLU(0.1),
            tnn.Linear(1024, emb_dim))

    def forward(self, pooled_chw, m, masks_chw, ix1, ix2, prd_vecs):
        x = pooled_chw.reshape(pooled_chw.size(0), -1)
        x = F.relu(self.fc6.fc(x))
        x = F.relu(self.fc7.fc(x))
        obj = self.so_vis_embeddings.fc(x[:m])
        x_u = F.relu(self.fc8.fc(x[m:]))
        so = F.relu(self.fc_so.fc(
            torch.cat([obj[ix1], obj[ix2]], dim=1)))
        z = masks_chw
        for blk in self.conv_lo:
            z = F.relu(blk.conv(z))
        lo = F.relu(self.fc_lov.fc(z.reshape(z.size(0), -1)))
        f = F.relu(self.fc_fusion.fc(torch.cat([x_u, so, lo], dim=1)))
        vis = self.fc_rel.fc(f)
        prd = self.prd_sem_embeddings(prd_vecs)
        prd = F.normalize(prd, p=2, dim=1)
        vis_n = F.normalize(vis, p=2, dim=1)
        return vis_n @ prd.t()


def test_jwyang_vrd_import_end_to_end(rng):
    """VRDHead with imported vrd.* weights == the torch replica, including
    the fc6 CHW->HWC flatten permutation, the conv tower (symmetric
    same-padding), and the cosine scoring."""
    c, pool, fc_dim, emb_dim, n_rel = 8, 7, 32, 16, 5
    tm = TorchVRD(c, pool, fc_dim, emb_dim)
    tm.eval()
    sd = {f"vrd.{k}": v for k, v in tm.state_dict().items()}

    b, hh, ww = 1, 20, 26
    fmap = rng.randn(b, hh, ww, c).astype(np.float32)
    m, p = 4, 6
    obj = np.zeros((m, 5), np.float32)
    obj[:, 1] = rng.uniform(0, 150, m)
    obj[:, 2] = rng.uniform(0, 120, m)
    obj[:, 3] = obj[:, 1] + rng.uniform(40, 160, m)
    obj[:, 4] = obj[:, 2] + rng.uniform(40, 120, m)
    ix1 = rng.randint(0, m, p).astype(np.int32)
    ix2 = rng.randint(0, m, p).astype(np.int32)
    uni = np.zeros((p, 5), np.float32)
    uni[:, 1] = np.minimum(obj[ix1, 1], obj[ix2, 1])
    uni[:, 2] = np.minimum(obj[ix1, 2], obj[ix2, 2])
    uni[:, 3] = np.maximum(obj[ix1, 3], obj[ix2, 3])
    uni[:, 4] = np.maximum(obj[ix1, 4], obj[ix2, 4])
    masks = rng.rand(p, 32, 32, 2).astype(np.float32)
    prd_vecs = rng.randn(n_rel, 300).astype(np.float32)

    # identical pooled features on both sides (np oracle == our roi_pool,
    # proven in test_roi_ops)
    pooled = np_roi_pool(fmap, np.concatenate([obj, uni]), pool, 1 / 16.0)
    with torch.no_grad():
        ref = tm(torch.from_numpy(pooled.transpose(0, 3, 1, 2)), m,
                 torch.from_numpy(masks.transpose(0, 3, 1, 2)),
                 torch.from_numpy(ix1.astype(np.int64)),
                 torch.from_numpy(ix2.astype(np.int64)),
                 torch.from_numpy(prd_vecs)).numpy()

    head = VRDHead(emb_dim=emb_dim, fc_dim=fc_dim, dtype=jnp.float32)
    init = head.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(fmap), jnp.asarray(obj), jnp.asarray(uni),
        jnp.asarray(masks), jnp.asarray(ix1), jnp.asarray(ix2),
        jnp.asarray(prd_vecs))["params"]
    params = merge_imported(init, jwyang_vrd_params(sd, fmap_channels=c,
                                                    pool=pool))
    out = head.apply({"params": params}, jnp.asarray(fmap), jnp.asarray(obj),
                     jnp.asarray(uni), jnp.asarray(masks), jnp.asarray(ix1),
                     jnp.asarray(ix2), jnp.asarray(prd_vecs))
    np.testing.assert_allclose(np.asarray(out["scores"]), ref,
                               rtol=1e-4, atol=1e-5)


def test_merge_imported_shape_mismatch_raises():
    init = {"a": {"kernel": np.zeros((3, 4), np.float32)}}
    with pytest.raises(ValueError):
        merge_imported(init, {"a": {"kernel": np.zeros((4, 3), np.float32)}})
    with pytest.raises(KeyError):
        merge_imported(init, {"b": {"kernel": np.zeros((3, 4), np.float32)}})
