"""Box geometry primitives (pure jnp, fixed shapes, vmap-friendly).

Behavioral parity targets:
  * IoU matrix       — reference ``overlaps_graph`` (yolo3_net_pos.py:954-975)
  * window clipping  — reference ``clip_boxes_graph`` (yolo3_net_pos.py:940-952)
  * cxcywh -> yxyx   — reference ``filter_detections`` (yolo3_net_pos.py:552-553)
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh_to_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., (xc, yc, w, h)] -> [..., (y1, x1, y2, x2)] (normalized coords)."""
    xc, yc, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([yc - h / 2.0, xc - w / 2.0, yc + h / 2.0, xc + w / 2.0], axis=-1)


def clip_boxes(boxes: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Clip [..., (y1,x1,y2,x2)] boxes to ``window`` = (wy1, wx1, wy2, wx2)."""
    wy1, wx1, wy2, wx2 = window[0], window[1], window[2], window[3]
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def iou_matrix_yxyx(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of two box sets in (y1, x1, y2, x2) format.

    boxes1: [N, 4], boxes2: [M, 4] -> [N, M].  Zero-area pairs yield 0/union
    exactly like the reference (no epsilon — reference divides by union
    directly; callers must mask invalid rows/cols).
    """
    b1 = boxes1[:, None, :]  # [N,1,4]
    b2 = boxes2[None, :, :]  # [1,M,4]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def iou_cxcywh_pairwise(pred_xywh: jnp.ndarray, true_xywh: jnp.ndarray) -> jnp.ndarray:
    """IoU used by the YOLO ignore-mask (yolo3_net_pos.py:657-677).

    pred_xywh: [..., 1, 4] broadcast against true_xywh: [..., T, 4] in
    (xc, yc, w, h); returns IoU clipped to [0, 1] with the reference's 1e-10
    union floor.
    """
    pred_xy = pred_xywh[..., 0:2]
    pred_wh = pred_xywh[..., 2:4]
    true_xy = true_xywh[..., 0:2]
    true_wh = true_xywh[..., 2:4]
    pred_min = pred_xy - pred_wh / 2.0
    pred_max = pred_xy + pred_wh / 2.0
    true_min = true_xy - true_wh / 2.0
    true_max = true_xy + true_wh / 2.0
    inter_wh = jnp.maximum(jnp.minimum(pred_max, true_max) - jnp.maximum(pred_min, true_min), 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = jnp.maximum(
        pred_wh[..., 0] * pred_wh[..., 1] + true_wh[..., 0] * true_wh[..., 1] - inter, 1e-10
    )
    return jnp.clip(inter / union, 0.0, 1.0)
