"""Overlay rendering: GT verification images and prediction visualizations.

Port of the reference's verification renderer (pre_process.py:234-310):
class masks alpha-blended onto the RGB image (crack=yellow 0.2, spall=cyan
0.15, rebar=magenta 0.2), red 2px instance boxes, indexed class labels.
The same renderer also serves predicted detections (the reference only
ships sample outputs, `output/` assets).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CLASS_COLORS: Dict[str, Tuple[Tuple[int, int, int], float]] = {
    "crack": ((255, 255, 0), 0.2),    # yellow
    "spall": ((0, 255, 255), 0.15),   # cyan
    "rebar": ((255, 0, 255), 0.2),    # magenta
}


def blend_mask(image: np.ndarray, mask: np.ndarray, classname: str) -> np.ndarray:
    """Alpha-blend one bool mask onto an RGB uint8 image (in place)."""
    color, alpha = CLASS_COLORS.get(classname, ((255, 0, 0), 0.2))
    sel = mask.astype(bool)
    for c in range(3):
        ch = image[:, :, c]
        ch[sel] = (ch[sel] * (1 - alpha) + alpha * color[c]).astype(np.uint8)
    return image


def draw_instances(image_rgb: np.ndarray,
                   instances: Sequence[Dict]) -> np.ndarray:
    """Render instances = [{'classname', 'mask' bool[H,W], 'box' (x1,y1,x2,y2),
    optional 'score'}] onto a copy of the image; returns uint8 RGB."""
    from PIL import Image, ImageDraw

    out = image_rgb.astype(np.uint8).copy()
    for inst in instances:
        if inst.get("mask") is not None:
            blend_mask(out, inst["mask"], inst["classname"])

    img = Image.fromarray(out)
    draw = ImageDraw.Draw(img)
    for j, inst in enumerate(instances):
        if inst.get("box") is None:
            continue
        x1, y1, x2, y2 = [int(v) for v in inst["box"]]
        draw.rectangle([x1, y1, x2, y2], outline=(255, 0, 0), width=2)
        label = f"{j} {inst['classname']}"
        if "score" in inst:
            label += f" {inst['score']:.2f}"
        draw.text((x1, max(y1 - 10, 0)), label, fill=(0, 0, 255))
    return np.asarray(img)


def render_groundtruth(dataset: str, phase: str, out_dir: Optional[str] = None,
                       limit: Optional[int] = None) -> List[str]:
    """Reference do_verification parity: overlay GT onto every split image."""
    import pickle

    try:
        import cv2
    except Exception as e:  # pragma: no cover
        raise RuntimeError("OpenCV required for GT rendering") from e
    from dis_yolo_tpu.data import rasterize

    split = os.path.join(dataset, phase)
    out_dir = out_dir or os.path.join(split, "verify")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(split, "cache", "ground_truth_cache.pkl"), "rb") as f:
        annotations = pickle.load(f)

    written = []
    for a in annotations[:limit]:
        img = cv2.cvtColor(cv2.imread(os.path.join(split, "images",
                                                   a["filename"])),
                           cv2.COLOR_BGR2RGB)
        h, w = a["size"]
        instances = []
        for r in a["regions"].values():
            mask = rasterize.instance_mask(r["shape_attributes"], h, w)
            bb = rasterize.mask_to_box(mask)
            if bb is None:
                continue
            instances.append({"classname": r["region_attributes"],
                              "mask": mask,
                              "box": (bb[0], bb[1], bb[2], bb[3])})
        rendered = draw_instances(img, instances)
        path = os.path.join(out_dir,
                            os.path.splitext(a["filename"])[0] + ".jpg")
        cv2.imwrite(path, cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
        written.append(path)
    return written
