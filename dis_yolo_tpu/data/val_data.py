"""Validation/test image loading: aspect-preserving letterbox + clip window.

Behavioral port of ``defect_val`` (utils/val_data.py): whole split loaded
once; each image resized to fit ``test_size`` preserving aspect ratio,
centered on a 127-gray canvas, /255; the normalized window (y1, x1, y2, x2)
of the non-pad region is returned for box clipping and un-letterboxing.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Tuple

import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.augment import resize_bilinear

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def letterbox_image(image_rgb: np.ndarray, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """One image -> (canvas [size,size,3] float /255, window [4]).

    Integer-floor resize dims and centering identical to
    val_data.py:36-63 / calculate_test_map.py:149-176.
    """
    ih, iw = image_rgb.shape[:2]
    if size / iw < size / ih:
        new_h = (ih * size) // iw
        new_w = size
    else:
        new_w = (iw * size) // ih
        new_h = size
    resized = resize_bilinear(image_rgb.astype(np.float32), new_w, new_h)
    top = (size - new_h) // 2
    left = (size - new_w) // 2
    canvas = np.full((size, size, 3), 127.0, np.float32)
    canvas[top:top + new_h, left:left + new_w, :] = resized
    window = np.asarray([top / size, left / size,
                         (new_h + top) / size, (new_w + left) / size], np.float32)
    return canvas / 255.0, window


class DefectValData:
    """Loads the whole split into RAM once (val_data.py:23-34)."""

    def __init__(self, cfg: DISYoloConfig, phase: str = "val"):
        self.cfg = cfg
        self.phase = phase
        split_dir = cfg.data_path(phase)
        cache_dir = os.path.join(split_dir, "cache")
        with open(os.path.join(cache_dir, "ground_truth_cache.pkl"), "rb") as f:
            annotations = pickle.load(f)
        annotations = [a for a in annotations if a["regions"]]
        with open(os.path.join(cache_dir, f"{phase}.txt")) as f:
            index = [x.strip() for x in f.readlines()]
        assert len(index) == len(annotations)
        self.image_paths: List[str] = []
        for i, stem in enumerate(index):
            assert os.path.splitext(annotations[i]["filename"])[0] == stem
            self.image_paths.append(os.path.join(split_dir, "images", stem + ".jpg"))

    def get(self):
        size = self.cfg.test_size
        n = len(self.image_paths)
        images = np.zeros((n, size, size, 3), np.float32)
        windows = np.zeros((n, 4), np.float32)
        names = []
        for i, path in enumerate(self.image_paths):
            bgr = cv2.imread(path)
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            images[i], windows[i] = letterbox_image(rgb, size)
            names.append(os.path.splitext(os.path.basename(path))[0])
        return images, names, windows
