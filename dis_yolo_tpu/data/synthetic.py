"""Synthetic concrete-defect dataset generator (test fixture / demo data).

The reference ships only 4 sample images; real data is a private download.
This generator fabricates a self-contained dataset in the exact on-disk
layout the pipeline consumes — images/, masks/ (per-class binary JPEGs) —
so the *whole* stack (pre-processing -> cache -> loader -> train -> eval)
can run hermetically in tests and demos.

Defects drawn: 'crack' = random thin poly-line; 'spall' = blobby ellipse;
'rebar' = thick bar.  Masks are drawn white-on-black per class, matching
what pre_process expects to contour.
"""

from __future__ import annotations

import os
import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _draw_crack(mask, rng, h, w):
    x, y = rng.randint(w // 4, 3 * w // 4), rng.randint(h // 8, h // 4)
    pts = [(x, y)]
    for _ in range(rng.randint(4, 8)):
        x = np.clip(x + rng.randint(-w // 8, w // 8), 5, w - 5)
        y = np.clip(y + rng.randint(h // 12, h // 6), 5, h - 5)
        pts.append((x, y))
    for a, b in zip(pts[:-1], pts[1:]):
        cv2.line(mask, a, b, 255, thickness=rng.randint(3, 6))


def _draw_spall(mask, rng, h, w):
    c = (rng.randint(w // 4, 3 * w // 4), rng.randint(h // 4, 3 * h // 4))
    axes = (rng.randint(w // 10, w // 5), rng.randint(h // 10, h // 5))
    cv2.ellipse(mask, c, axes, rng.randint(0, 180), 0, 360, 255, -1)


def _draw_rebar(mask, rng, h, w):
    x = rng.randint(w // 4, 3 * w // 4)
    y0 = rng.randint(h // 8, h // 4)
    y1 = rng.randint(3 * h // 4, 7 * h // 8)
    cv2.line(mask, (x, y0), (x, y1), 255, thickness=rng.randint(8, 14))


def generate_dataset(root: str, phases=("train", "val", "test"),
                     images_per_phase: int = 8, image_size: int = 320,
                     seed: int = 0) -> str:
    """Create a synthetic dataset under ``root``; returns ``root``."""
    if cv2 is None:
        raise RuntimeError("OpenCV required for the synthetic generator")
    rng = np.random.RandomState(seed)
    drawers = {"crack": _draw_crack, "spall": _draw_spall, "rebar": _draw_rebar}

    for phase in phases:
        img_dir = os.path.join(root, phase, "images")
        mask_dir = os.path.join(root, phase, "masks")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        for i in range(images_per_phase):
            h = image_size + int(rng.randint(0, 3)) * 32   # vary aspect a bit
            w = image_size
            # concrete-ish texture
            img = (rng.normal(140, 25, (h, w, 3))).clip(0, 255).astype(np.uint8)
            stem = f"{phase}{i:04d}"
            class_masks = {}
            n_defects = rng.randint(1, 4)
            chosen = rng.choice(list(drawers), size=n_defects, replace=True)
            for cls in chosen:
                m = class_masks.setdefault(cls, np.zeros((h, w), np.uint8))
                drawers[cls](m, rng, h, w)
            for cls, m in class_masks.items():
                img[m > 0] = (img[m > 0] * 0.4).astype(np.uint8)  # darken defect
                cv2.imwrite(os.path.join(mask_dir, f"{stem}{cls}.jpg"), m)
            cv2.imwrite(os.path.join(img_dir, f"{stem}.jpg"), img)
    return root
