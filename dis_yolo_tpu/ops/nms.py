"""Fully on-device, fixed-shape detection filtering + class-aware NMS.

Replaces the reference's per-image Python loop with dynamic-shape TF ops
(``filter_detections``, yolo3_net_pos.py:517-628: tf.where / tf.unique /
tf.map_fn over ``tf.image.non_max_suppression`` / tf.sets intersection) with
a batched masked computation:

  1. class-specific confidence = sigmoid(obj) * max softmax(class)
     (yolo3_net_pos.py:544-548)
  2. cxcywh -> yxyx, clip to per-image window (":552-555")
  3. validity = conf > obj_threshold (strict, ":558")
  4. top-K score-sorted shortlist, greedy *per-class* suppression at
     IoU > iou_threshold (":565-592"), O(K^2) with a lax.fori_loop
  5. keep top ``max_detection`` survivors sorted by score, zero-padded rows
     of (y1, x1, y2, x2, classid, conf) (":607-627")

Everything is vmapped over the batch; output shape is [B, max_detection, 6].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.ops import boxes as box_ops
from dis_yolo_tpu.ops.decode import ScalePrediction


def flatten_predictions(preds: Sequence[ScalePrediction]):
    """Concatenate the 3 scales into flat per-anchor arrays.

    Returns (conf [B,N], class_prob [B,N,C], boxes_cxcywh [B,N,4]).
    """
    confs, probs, coords = [], [], []
    for p in preds:
        b = p.conf_logit.shape[0]
        confs.append(jax.nn.sigmoid(p.conf_logit[..., 0]).reshape(b, -1))
        c = p.class_logit.shape[-1]
        probs.append(jax.nn.softmax(p.class_logit, axis=-1).reshape(b, -1, c))
        coords.append(p.norm_coord.reshape(b, -1, 4))
    return (jnp.concatenate(confs, axis=1),
            jnp.concatenate(probs, axis=1),
            jnp.concatenate(coords, axis=1))


def _greedy_class_nms(boxes: jnp.ndarray, scores: jnp.ndarray, classids: jnp.ndarray,
                      valid: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted candidates.

    boxes [K,4] yxyx (already sorted by descending score), scores [K],
    classids [K] int32, valid [K] bool.  Returns the surviving mask [K].
    Suppression only applies between same-class candidates, mirroring the
    reference's per-class-id map_fn NMS.
    """
    k = boxes.shape[0]
    iou = box_ops.iou_matrix_yxyx(boxes, boxes)                    # [K,K]
    same_class = classids[:, None] == classids[None, :]
    # j suppresses i only if j comes earlier (higher score) in sort order
    earlier = jnp.arange(k)[:, None] > jnp.arange(k)[None, :]      # [i, j] j<i
    suppress_pair = (iou > iou_thresh) & same_class & earlier      # [i, j]

    def body(i, keep):
        # candidate i survives iff no *kept* earlier same-class box overlaps
        suppressed = jnp.any(suppress_pair[i] & keep)
        keep_i = valid[i] & jnp.logical_not(suppressed)
        return keep.at[i].set(keep_i)

    keep0 = jnp.zeros((k,), dtype=bool)
    return jax.lax.fori_loop(0, k, body, keep0)


def filter_detections_single(conf: jnp.ndarray, class_prob: jnp.ndarray,
                             coord_cxcywh: jnp.ndarray, window: jnp.ndarray,
                             cfg: DISYoloConfig, obj_thresh) -> jnp.ndarray:
    """One image: [N] conf, [N,C] probs, [N,4] cxcywh, [4] window -> [D,6]."""
    classid = jnp.argmax(class_prob, axis=-1).astype(jnp.int32)      # [N]
    class_max = jnp.max(class_prob, axis=-1)
    score = conf * class_max                                          # [N]

    boxes = box_ops.cxcywh_to_yxyx(coord_cxcywh)
    boxes = box_ops.clip_boxes(boxes, window)

    valid = score > obj_thresh

    k = min(cfg.pre_nms_top_k, score.shape[0])
    masked_score = jnp.where(valid, score, -1.0)
    top_score, top_idx = jax.lax.top_k(masked_score, k)
    top_boxes = boxes[top_idx]
    top_class = classid[top_idx]
    top_valid = top_score > obj_thresh

    keep = _greedy_class_nms(top_boxes, top_score, top_class, top_valid,
                             cfg.iou_threshold)

    # Select the top `max_detection` survivors (already score-sorted).
    d = cfg.max_detection
    kept_score = jnp.where(keep, top_score, -1.0)
    if k < d:  # fewer candidates than output slots: pad before top_k
        pad = d - k
        kept_score = jnp.concatenate([kept_score, jnp.full((pad,), -1.0)])
        top_boxes = jnp.concatenate([top_boxes, jnp.zeros((pad, 4))])
        top_class = jnp.concatenate([top_class, jnp.zeros((pad,), jnp.int32)])
    out_score, out_sel = jax.lax.top_k(kept_score, d)
    out_valid = out_score > obj_thresh
    det = jnp.concatenate([
        top_boxes[out_sel],
        top_class[out_sel].astype(jnp.float32)[:, None],
        out_score[:, None],
    ], axis=-1)
    return jnp.where(out_valid[:, None], det, 0.0)                    # [D,6]


def filter_detections(preds: Sequence[ScalePrediction], windows: jnp.ndarray,
                      cfg: DISYoloConfig, obj_thresh=None) -> jnp.ndarray:
    """Batched detection head: ScalePredictions + [B,4] windows -> [B,D,6]."""
    if obj_thresh is None:
        obj_thresh = cfg.obj_threshold
    conf, prob, coord = flatten_predictions(preds)
    fn = lambda c, p, x, w: filter_detections_single(c, p, x, w, cfg, obj_thresh)
    return jax.vmap(fn)(conf, prob, coord, windows)
