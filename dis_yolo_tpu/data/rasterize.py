"""Polygon -> instance-mask rasterization (host side, cache-friendly).

Reproduces the GT semantics of the reference loaders (train_data.py:321-339,
validation_map.py:72-102): each instance is a list of polygons with
``type`` 'out' (filled True) or 'in' (interior hole filled False), applied
in order, and every polygon's *vertex pixels are always set True* — so a
hole's rim remains part of the mask.

Two fill engines:
  * cv2.fillPoly (native C++, default when OpenCV is present)
  * a pure-numpy even-odd scanline fill (exact pixel-center semantics,
    used as fallback and as the parity oracle in tests)

The reference re-rasterizes every instance every epoch
(train_data.py:79); here callers cache results (see dataset.MaskCache).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def fill_polygon_scanline(xs: np.ndarray, ys: np.ndarray, h: int, w: int) -> np.ndarray:
    """Even-odd scanline fill over pixel centers (y, x integer grid).

    Matches the classic point-in-polygon convention used by
    skimage.draw.polygon: pixel (r, c) is inside iff a ray from (r, c)
    crosses the polygon boundary an odd number of times.
    """
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    mask = np.zeros((h, w), dtype=bool)
    if len(xs) < 3:
        return mask
    y0 = max(int(np.floor(ys.min())), 0)
    y1 = min(int(np.ceil(ys.max())), h - 1)
    x_next = np.roll(xs, -1)
    y_next = np.roll(ys, -1)
    for r in range(y0, y1 + 1):
        # edges straddling this scanline (half-open to avoid double counts)
        c1 = (ys <= r) & (y_next > r)
        c2 = (y_next <= r) & (ys > r)
        sel = c1 | c2
        if not sel.any():
            continue
        t = (r - ys[sel]) / (y_next[sel] - ys[sel])
        xcross = np.sort(xs[sel] + t * (x_next[sel] - xs[sel]))
        for i in range(0, len(xcross) - 1, 2):
            a = max(int(np.ceil(xcross[i])), 0)
            b = min(int(np.floor(xcross[i + 1])), w - 1)
            if b >= a:
                mask[r, a:b + 1] = True
    _draw_edges(mask, xs, ys)   # boundary-inclusive (cv2/skimage semantics)
    return mask


def _draw_edges(mask: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> None:
    """Set every pixel along the polygon outline True (boundary-inclusive
    semantics, matching cv2.fillPoly / skimage.draw.polygon)."""
    h, w = mask.shape
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    for i in range(len(xs)):
        n = int(max(abs(x2[i] - xs[i]), abs(y2[i] - ys[i]))) + 1
        t = np.linspace(0.0, 1.0, n + 1)
        px = np.clip(np.round(xs[i] + t * (x2[i] - xs[i])).astype(int), 0, w - 1)
        py = np.clip(np.round(ys[i] + t * (y2[i] - ys[i])).astype(int), 0, h - 1)
        mask[py, px] = True


def _native_available() -> bool:
    try:
        from dis_yolo_tpu import native
        return native.available()
    except Exception:  # pragma: no cover
        return False


def _fill(xs: Sequence[int], ys: Sequence[int], h: int, w: int,
          engine: str = "auto") -> np.ndarray:
    """Fill one polygon.  Engine order for 'auto': native C++ (identical
    semantics to the numpy scanline, ~100x faster) -> cv2 -> numpy."""
    if engine in ("auto", "native") and _native_available():
        from dis_yolo_tpu import native
        return native.fill_polygon(xs, ys, h, w).astype(bool)
    if engine == "numpy" or (engine in ("auto", "native") and not _HAS_CV2):
        return fill_polygon_scanline(np.asarray(xs), np.asarray(ys), h, w)
    pts = np.stack([np.asarray(xs), np.asarray(ys)], axis=1).astype(np.int32)
    out = np.zeros((h, w), dtype=np.uint8)
    cv2.fillPoly(out, [pts], 1)
    return out.astype(bool)


def _set_boundary(mask: np.ndarray, xs, ys, value: bool = True) -> None:
    xs = np.clip(np.asarray(xs, np.int64), 0, mask.shape[1] - 1)
    ys = np.clip(np.asarray(ys, np.int64), 0, mask.shape[0] - 1)
    mask[ys, xs] = value


def instance_mask(polygons: List[Dict], h: int, w: int,
                  engine: str = "auto") -> np.ndarray:
    """Rasterize one instance (list of {'type', 'all_points_x/y'}) -> bool mask."""
    m = np.zeros((h, w), dtype=bool)
    for poly in polygons:
        xs, ys = poly["all_points_x"], poly["all_points_y"]
        filled = _fill(xs, ys, h, w, engine)
        if poly["type"] == "out":
            m |= filled
        else:                       # 'in': interior hole, rim stays on
            m &= ~filled
        _set_boundary(m, xs, ys, True)
    return m


def instance_masks(all_polygons: List[List[Dict]], h: int, w: int,
                   max_instances: int, engine: str = "auto") -> np.ndarray:
    """Padded stack [max_instances, h, w] of instance masks."""
    out = np.zeros((max_instances, h, w), dtype=bool)
    for i, polys in enumerate(all_polygons[:max_instances]):
        out[i] = instance_mask(polys, h, w, engine)
    return out


def mask_to_box(mask: np.ndarray):
    """Tight (x1, y1, x2, y2) with exclusive max edge (train_data.py:358-374).

    Returns None for an empty mask.
    """
    cols = np.flatnonzero(mask.any(axis=0))
    rows = np.flatnonzero(mask.any(axis=1))
    if len(cols) == 0 or len(rows) == 0:
        return None
    return int(cols[0]), int(rows[0]), int(cols[-1]) + 1, int(rows[-1]) + 1
