"""Native C++ IO runtime: build, decode parity vs cv2, and full-batch
parity against the Python (cv2) loader path."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.fixtures import make_voc_dataset

from i2vsgg_tpu import runtime


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nio"))
    make_voc_dataset(root, "MVRD", [f"i{i}" for i in range(6)], ".jpg",
                     seed=7, hw=(120, 160))
    make_voc_dataset(root, "MVidVRD", [f"p{i}" for i in range(4)], ".png",
                     seed=8, hw=(100, 140))
    old = os.environ.get("I2VSGG_DATA_ROOT")
    os.environ["I2VSGG_DATA_ROOT"] = root
    yield root
    if old is None:
        os.environ.pop("I2VSGG_DATA_ROOT", None)
    else:
        os.environ["I2VSGG_DATA_ROOT"] = old


def test_native_builds():
    assert runtime.available(), runtime.build_error()


def test_decode_parity_vs_cv2(dataset):
    import cv2
    for rel in ("MVRD/JPEGImages/i0.jpg", "MVidVRD/JPEGImages/p0.png"):
        p = os.path.join(dataset, rel)
        ours = runtime.decode_image(p)
        ref = cv2.imread(p, cv2.IMREAD_COLOR)
        assert ours.shape == ref.shape
        np.testing.assert_array_equal(ours, ref, err_msg=rel)


def test_load_batch_matches_python_prep(dataset):
    from i2vsgg_tpu.data.pipeline import imread_bgr, prep_image
    means = (102.9801, 115.9465, 122.7717)
    paths = [os.path.join(dataset, "MVRD", "JPEGImages", f"i{i}.jpg")
             for i in range(3)]
    imgs, scales, hw = runtime.load_batch(paths, [False, True, False],
                                          means, 96, 160, 200)
    for i, p in enumerate(paths):
        im = imread_bgr(p)
        if i == 1:
            im = im[:, ::-1, :]
        ref, ref_scale = prep_image(im, 96, means)
        assert scales[i] == pytest.approx(ref_scale)
        rh, rw = ref.shape[:2]
        assert (hw[i] == [rh, rw]).all()
        np.testing.assert_allclose(imgs[i, :rh, :rw], ref, atol=1e-3,
                                   err_msg=f"{p} flip={i == 1}")
        # padding stays zero
        assert np.all(imgs[i, rh:] == 0) and np.all(imgs[i, :, rw:] == 0)


def test_loader_native_equals_python(dataset):
    """Full DetectionLoader batches: native path == cv2 path."""
    from i2vsgg_tpu.config import Config
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb

    cfg = Config().replace(
        TRAIN=Config().TRAIN.__class__(SCALES=(96,), MAX_NUM_GT_BOXES=6))
    imdb, roidb, _, idx = combined_roidb("MVRD_trainval")
    a = DetectionLoader(roidb, idx, cfg, 2, training=True, seed=5,
                        native=True)
    b = DetectionLoader(roidb, idx, cfg, 2, training=True, seed=5,
                        native=False)
    assert a.native and not b.native
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["indices"], bb["indices"])
        np.testing.assert_allclose(ba["image"], bb["image"], atol=1e-3)
        np.testing.assert_allclose(ba["im_info"], bb["im_info"], rtol=1e-6)
        np.testing.assert_allclose(ba["gt_boxes"], bb["gt_boxes"], rtol=1e-5)
        np.testing.assert_array_equal(ba["num_boxes"], bb["num_boxes"])


def test_gt_truncate_first_preserves_annotation_order(dataset):
    """SGG loaders must keep the first g boxes in ORIGINAL annotation order
    when an image exceeds MAX_NUM_GT_BOXES (relation triples index into that
    order); the default shuffle mode may permute."""
    from i2vsgg_tpu.config import Config
    from i2vsgg_tpu.data.pipeline import DetectionLoader
    from i2vsgg_tpu.data.roidb import combined_roidb

    g = 2  # force truncation: fixture images have >2 boxes
    cfg = Config().replace(
        TRAIN=Config().TRAIN.__class__(SCALES=(96,), MAX_NUM_GT_BOXES=g))
    imdb, roidb, _, idx = combined_roidb("MVRD_trainval", use_flipped=False)
    assert any(len(e["boxes"]) > g for e in roidb), "fixture too sparse"
    for native in (False, True):
        loader = DetectionLoader(roidb, idx, cfg, 1, training=True, seed=5,
                                 native=native, gt_truncate="first")
        for batch in loader:
            e = roidb[int(batch["indices"][0])]
            n = int(batch["num_boxes"][0])
            assert n == min(len(e["boxes"]), g)
            scale = batch["im_info"][0, 2]
            want = e["boxes"][:n] * scale
            h, w = batch["im_info"][0, :2]
            want = np.clip(want, 0, [w - 1, h - 1, w - 1, h - 1])
            np.testing.assert_allclose(batch["gt_boxes"][0, :n, :4], want,
                                       rtol=1e-5)
            np.testing.assert_array_equal(batch["gt_boxes"][0, :n, 4],
                                          e["gt_classes"][:n])


def test_uint8_transport_matches_f32(dataset):
    """uint8 eval transport (resize in uint8, mean-subtract on device) must
    equal the f32 loader path up to the <=1-intensity-level rounding of
    resized pixels — including EXACT zeros in the padded region (f32 pads
    after subtraction, i.e. with the mean pixel)."""
    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config
    from i2vsgg_tpu.data.pipeline import (DetectionLoader,
                                          dequantize_image_u8)
    from i2vsgg_tpu.data.roidb import combined_roidb

    cfg = Config().replace(TEST=Config().TEST.__class__(SCALES=(96,)))
    imdb, roidb, _, idx = combined_roidb("MVRD_test", training=False,
                                         use_flipped=False)
    lf = DetectionLoader(roidb, idx, cfg, 2, training=False, native=False)
    lu = DetectionLoader(roidb, idx, cfg, 2, training=False,
                         uint8_transport=True)
    for bf, bu in zip(lf, lu):
        assert bu["image_u8"].dtype == np.uint8
        deq = np.asarray(dequantize_image_u8(
            jnp.asarray(bu["image_u8"]), jnp.asarray(bu["im_info"]),
            cfg.PIXEL_MEANS))
        np.testing.assert_allclose(deq, bf["image"], atol=1.0)
        # padded region must be exactly zero in both transports
        h, w = int(bf["im_info"][0, 0]), int(bf["im_info"][0, 1])
        assert np.all(deq[0, h:] == 0.0) and np.all(deq[0, :, w:] == 0.0)
        np.testing.assert_array_equal(bf["im_info"], bu["im_info"])


def test_load_batch_raises_on_missing(dataset):
    with pytest.raises(RuntimeError):
        runtime.load_batch(["/nonexistent/x.jpg"], [False],
                           (0, 0, 0), 96, 100, 100)


def test_native_pack_planes_bit_identical_to_numpy():
    """The C++ conv1 parity-plane packer (i2v_pack_planes) matches the
    numpy oracle bit for bit — RNE f32->bf16 and the exact plane layout —
    across even/odd image dims (the host-planes serving contract)."""
    from i2vsgg_tpu.ops.pallas.conv1_kernel import pack_conv1_planes_np
    assert runtime.available(), runtime.build_error()
    rng = np.random.RandomState(8)
    for shape in [(1, 64, 96), (2, 50, 70), (1, 47, 131), (3, 33, 40)]:
        x = (rng.randn(*shape, 3) * 25).astype(np.float32)
        a = pack_conv1_planes_np(x, native=False)
        b = pack_conv1_planes_np(x, native=True)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a.view(np.uint16), b.view(np.uint16))
