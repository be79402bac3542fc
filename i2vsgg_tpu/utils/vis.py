"""Detection visualization — ``vis_detections`` parity
(``lib/model/utils/net_utils.py:38-50``): draw class/score-labelled boxes on
an image for the drivers' ``--vis`` mode."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def vis_detections(im_bgr: np.ndarray, class_name: str, dets: np.ndarray,
                   thresh: float = 0.8) -> np.ndarray:
    """Draw detections of one class. dets: (N, 5) [x1, y1, x2, y2, score].

    Returns the image (RGB uint8) with boxes drawn; input is BGR like the
    pipeline's decoded frames.
    """
    from PIL import Image, ImageDraw

    rgb = np.ascontiguousarray(im_bgr[..., ::-1]).astype(np.uint8)
    img = Image.fromarray(rgb)
    draw = ImageDraw.Draw(img)
    for i in range(dets.shape[0]):
        score = float(dets[i, -1])
        if score <= thresh:
            continue
        x1, y1, x2, y2 = [float(v) for v in dets[i, :4]]
        draw.rectangle([x1, y1, x2, y2], outline=(204, 0, 0), width=2)
        draw.text((x1 + 2, max(0.0, y1 - 12)),
                  f"{class_name}: {score:.3f}", fill=(204, 0, 0))
    return np.asarray(img)


def save_vis(im_bgr: np.ndarray, all_class_dets: Sequence, classes: Sequence[str],
             out_path: str, thresh: float = 0.5) -> None:
    """Draw every class's detections and save to ``out_path``."""
    from PIL import Image

    img = np.ascontiguousarray(im_bgr[..., ::-1]).astype(np.uint8)
    for j, dets in enumerate(all_class_dets):
        if j == 0 or dets is None or len(dets) == 0:
            continue
        img = vis_detections(img[..., ::-1], classes[j], np.asarray(dets),
                             thresh)
    Image.fromarray(img).save(out_path)
