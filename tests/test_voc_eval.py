"""VOC AP evaluation: golden-value unit tests (hand-computed AP cases,
difficult handling, 07 vs AUC metric)."""

import os

import numpy as np

from i2vsgg_tpu.eval.voc_eval import voc_ap, voc_eval


def test_voc_ap_auc_simple():
    # 3 detections, 2 GT: TP, FP, TP -> prec [1, .5, 2/3], rec [.5, .5, 1]
    rec = np.asarray([0.5, 0.5, 1.0])
    prec = np.asarray([1.0, 0.5, 2.0 / 3.0])
    # AUC with precision envelope: [0,.5): 1.0; [.5,1): 2/3
    np.testing.assert_allclose(voc_ap(rec, prec),
                               0.5 * 1.0 + 0.5 * (2.0 / 3.0))


def test_voc_ap_07_metric():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 1.0])
    # perfect detector: 11-point AP = 1.0
    np.testing.assert_allclose(voc_ap(rec, prec, use_07_metric=True), 1.0)


def _write_xml(path, objs):
    lines = ["<annotation>"]
    for name, (x1, y1, x2, y2), diff in objs:
        lines += ["<object>", f"<name>{name}</name>",
                  f"<difficult>{diff}</difficult>", "<bndbox>",
                  f"<xmin>{x1}</xmin>", f"<ymin>{y1}</ymin>",
                  f"<xmax>{x2}</xmax>", f"<ymax>{y2}</ymax>",
                  "</bndbox>", "</object>"]
    lines.append("</annotation>")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_voc_eval_end_to_end(tmp_path):
    anno = tmp_path / "anno"
    anno.mkdir()
    _write_xml(anno / "im1.xml", [("cat", (10, 10, 50, 50), 0),
                                  ("cat", (100, 100, 150, 150), 0)])
    _write_xml(anno / "im2.xml", [("cat", (20, 20, 60, 60), 0),
                                  ("cat", (200, 200, 240, 240), 1)])  # difficult
    # detections: im1 hits box1 (IoU 1.0); im1 false positive; im2 hits;
    # im2 detection on the DIFFICULT gt (must not count as TP or FP)
    det = tmp_path / "det_cat.txt"
    det.write_text("\n".join([
        "im1 0.9 10 10 50 50",
        "im1 0.8 300 300 340 340",
        "im2 0.7 20 20 60 60",
        "im2 0.6 200 200 240 240",
    ]) + "\n")
    rec, prec, ap = voc_eval(str(det), str(anno / "{}.xml"),
                             ["im1", "im2"], "cat", str(tmp_path / "cache"))
    # npos = 3 (difficult excluded); TPs: det1, det3; FP: det2; det4
    # matches the difficult gt -> neither TP nor FP (flat curve row)
    np.testing.assert_allclose(rec, [1 / 3, 1 / 3, 2 / 3, 2 / 3])
    np.testing.assert_allclose(prec, [1.0, 0.5, 2 / 3, 2 / 3])
    expected_ap = (1 / 3) * 1.0 + (1 / 3) * (2 / 3)
    np.testing.assert_allclose(ap, expected_ap)
