"""Synthetic VOC-layout fixture datasets for end-to-end driver tests.

Generates tiny MVRD (.jpg source) and MVidVRD (.png target, video-frame
naming ``<vid>_<fno>``) trees plus relation pickles and a video-annotation
JSON, matching the on-disk schema the reference consumes (SURVEY.md §2
"Datasets: MVRD/MVidVRD", ``lib/utils.py`` JSON flow).
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
from PIL import Image

VRD15 = ("airplane", "ball", "bear", "bicycle", "bus", "car", "cat", "dog",
         "elephant", "horse", "motorcycle", "person", "skateboard", "sofa",
         "train")


def _write_xml(path, size, objs):
    h, w = size
    lines = ["<annotation>", f"<size><width>{w}</width>"
             f"<height>{h}</height><depth>3</depth></size>"]
    for name, (x1, y1, x2, y2) in objs:
        lines += ["<object>", f"<name>{name}</name>",
                  "<difficult>0</difficult>",
                  "<bndbox>", f"<xmin>{x1 + 1}</xmin>", f"<ymin>{y1 + 1}</ymin>",
                  f"<xmax>{x2 + 1}</xmax>", f"<ymax>{y2 + 1}</ymax>",
                  "</bndbox>", "</object>"]
    lines.append("</annotation>")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def make_voc_dataset(root, ds_name, indices, ext, seed=0, hw=(96, 128),
                     splits=("trainval", "val", "test")):
    rng = np.random.RandomState(seed)
    base = os.path.join(root, ds_name)
    for sub in ("Annotations", "JPEGImages", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    h, w = hw
    annos = {}
    for index in indices:
        im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(im).save(
            os.path.join(base, "JPEGImages", index + ext))
        objs = []
        for _ in range(rng.randint(2, 4)):
            x1 = rng.randint(0, w - 30)
            y1 = rng.randint(0, h - 30)
            bw, bh = rng.randint(15, 28, 2)
            cls = VRD15[rng.randint(len(VRD15))]
            objs.append((cls, (x1, y1, min(x1 + bw, w - 1),
                               min(y1 + bh, h - 1))))
        _write_xml(os.path.join(base, "Annotations", index + ".xml"),
                   (h, w), objs)
        annos[index] = objs
    for split in splits:
        with open(os.path.join(base, "ImageSets", "Main",
                               split + ".txt"), "w") as f:
            f.write("\n".join(indices) + "\n")
    return annos


def make_fixture_root(root, n_rel=7, n_videos=2, frames_per_video=6):
    """Full fixture: MVRD source (8 stills) + MVidVRD target (video frames)
    + source gt_rels pickle + video annotation JSON. Returns paths dict."""
    src_idx = [f"img{i:03d}" for i in range(8)]
    annos_s = make_voc_dataset(root, "MVRD", src_idx, ".jpg", seed=1)

    tgt_idx = [f"vid{v:02d}_{f:04d}" for v in range(n_videos)
               for f in range(frames_per_video)]
    annos_t = make_voc_dataset(root, "MVidVRD", tgt_idx, ".png", seed=2)

    rng = np.random.RandomState(3)
    gt_rels = {}
    for index, objs in annos_s.items():
        n = len(objs)
        rels = []
        for _ in range(min(3, n * (n - 1))):
            s, o = rng.choice(n, 2, replace=False)
            rels.append((int(s), int(rng.randint(n_rel)), int(o)))
        gt_rels[index] = rels
    rels_path = os.path.join(root, "MVidVRD", "source_gt_rels.pkl")
    with open(rels_path, "wb") as f:
        pickle.dump(gt_rels, f)

    # target-domain gt rels (recognition task) + subject-object prior
    tgt_rels = {}
    for index, objs in annos_t.items():
        n = len(objs)
        if n >= 2:
            tgt_rels[index] = [(0, int(rng.randint(n_rel)), 1)]
    tgt_rels_path = os.path.join(root, "MVidVRD", "target_gt_rels.pkl")
    with open(tgt_rels_path, "wb") as f:
        pickle.dump(tgt_rels, f)
    so_prior = rng.dirichlet(np.ones(n_rel), size=(len(VRD15), len(VRD15)))
    so_prior_path = os.path.join(root, "MVidVRD", "source_so_prior.pkl")
    with open(so_prior_path, "wb") as f:
        pickle.dump(so_prior, f)

    # video-level GT in the evaluate() schema [lib/utils.py:375-458]
    class_ids = {c: i + 1 for i, c in enumerate(VRD15)}
    video_ann = {}
    for v in range(n_videos):
        vid = f"vid{v:02d}"
        rels = []
        first = annos_t[f"{vid}_0000"]
        if len(first) >= 2:
            straj = [list(map(float, first[0][1]))
                     for _ in range(frames_per_video)]
            otraj = [list(map(float, first[1][1]))
                     for _ in range(frames_per_video)]
            rels.append({
                "triplet": [class_ids[first[0][0]], 0,
                            class_ids[first[1][0]]],
                "duration": [0, frames_per_video],
                "sub_traj": straj, "obj_traj": otraj,
            })
        video_ann[vid] = rels
    ann_path = os.path.join(root, "MVidVRD", "video_annotations.json")
    with open(ann_path, "w") as f:
        json.dump(video_ann, f)
    return {"root": root, "gt_rels": rels_path, "video_ann": ann_path,
            "target_gt_rels": tgt_rels_path, "so_prior": so_prior_path,
            "n_rel": n_rel}
