"""Literal numpy port of the reference's composed inference chain.

Oracle for tests/test_composed_oracle.py: given the raw head tensors, this
reproduces — operation for operation, in float32 —

  * ``interpret_output``   (yolo3_net_pos.py:465-514)
  * ``filter_detections``  (yolo3_net_pos.py:517-628, per-class tf NMS path)
  * ``val_test``           (yolo3_net_pos.py:862-938, incl. the per-box
                            grid-line construction of assemble_kmask_from_box)

so rounding/ordering drift between the per-op parity tests can't hide in the
composition.  Dynamic/ragged shapes are kept (python lists), exactly like
the reference graph.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_interpret_output(raws: Sequence[np.ndarray], anchors: np.ndarray):
    """:465-514 — returns (conf_logits, class_logits, norm_coords) lists.

    raws[i]: [B, H, W, 3, 5+C] float32, raws[0] = stride-8 map; ``anchors``
    [9, 2] pixel anchors, scale i uses rows 3i:3i+3 (:495-496).
    """
    net_h = np.float32(raws[2].shape[1] * 32)
    net_w = np.float32(raws[2].shape[2] * 32)
    net_factor = np.array([net_w, net_h], np.float32)

    conf_logits, class_logits, norm_coords = [], [], []
    for i, preds in enumerate(raws):
        preds = preds.astype(np.float32)
        gh, gw = preds.shape[1], preds.shape[2]
        grid_factor = np.array([gw, gh], np.float32)

        pred_conf = preds[..., 4:5]
        pred_class = preds[..., 5:]
        pred_cxy = _sigmoid(preds[..., :2])

        xs = np.tile(np.arange(gw, dtype=np.float32)[None, :], (gh, 1))
        ys = np.tile(np.arange(gh, dtype=np.float32)[:, None], (1, gw))
        cell = np.stack([xs, ys], axis=-1)[None, :, :, None, :]
        box_xy = (cell + pred_cxy) / grid_factor

        awh = anchors[3 * i: 3 * i + 3].astype(np.float32)      # [3, 2]
        box_wh = np.exp(preds[..., 2:4]) * awh[None, None, None] / net_factor

        conf_logits.append(pred_conf)
        class_logits.append(pred_class)
        norm_coords.append(np.concatenate([box_xy, box_wh], axis=-1))
    return conf_logits, class_logits, norm_coords


def _np_iou_yxyx(a: np.ndarray, b: np.ndarray) -> float:
    y1 = max(a[0], b[0])
    x1 = max(a[1], b[1])
    y2 = min(a[2], b[2])
    x2 = min(a[3], b[3])
    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / union if union > 0 else 0.0


def _np_tf_nms(boxes: np.ndarray, scores: np.ndarray, max_out: int,
               iou_thresh: float) -> np.ndarray:
    """tf.image.non_max_suppression: greedy by score, suppress IoU > thresh."""
    order = np.argsort(-scores, kind="stable")
    keep: List[int] = []
    for i in order:
        if all(_np_iou_yxyx(boxes[i], boxes[j]) <= iou_thresh for j in keep):
            keep.append(int(i))
            if len(keep) == max_out:
                break
    return np.asarray(keep, np.int64)


def np_filter_detections(conf_logits, class_logits, norm_coords,
                         windows: np.ndarray, obj_thresh: float,
                         nms_thresh: float, max_detection: int,
                         num_class: int) -> np.ndarray:
    """:517-628 — per-image flatten, class-conf, clip, threshold, per-class
    NMS, set-intersection, global top-k, zero-pad to [B, max_detection, 6]."""
    batch = conf_logits[0].shape[0]
    out = np.zeros((batch, max_detection, 6), np.float32)
    for i in range(batch):
        pred_conf = np.concatenate(
            [_sigmoid(c[i]).reshape(-1) for c in conf_logits]).astype(np.float32)
        pred_class = np.concatenate(
            [_softmax(c[i], axis=-1).reshape(-1, num_class)
             for c in class_logits]).astype(np.float32)
        pred_box = np.concatenate(
            [n[i].reshape(-1, 4) for n in norm_coords]).astype(np.float32)

        classid = np.argmax(pred_class, axis=-1).astype(np.int32)
        classmax = pred_class[np.arange(len(classid)), classid]
        conf_class = pred_conf * classmax

        xc, yc, w, h = pred_box.T
        boxes = np.stack([yc - h / 2.0, xc - w / 2.0,
                          yc + h / 2.0, xc + w / 2.0], axis=1)
        wy1, wx1, wy2, wx2 = windows[i].astype(np.float32)
        boxes[:, 0] = np.clip(boxes[:, 0], wy1, wy2)   # clip_boxes_graph
        boxes[:, 1] = np.clip(boxes[:, 1], wx1, wx2)   # (:940-952)
        boxes[:, 2] = np.clip(boxes[:, 2], wy1, wy2)
        boxes[:, 3] = np.clip(boxes[:, 3], wx1, wx2)

        keep = np.where(conf_class > obj_thresh)[0]            # :558 strict
        nms_keep: List[int] = []
        for cid in np.unique(classid[keep]):                   # :565-592
            ixs = keep[classid[keep] == cid]
            sel = _np_tf_nms(boxes[ixs], conf_class[ixs],
                             max_detection, nms_thresh)
            nms_keep.extend(int(v) for v in ixs[sel])
        # tf.sets.set_intersection returns sorted values (:588-592)
        keep = np.asarray(sorted(set(keep.tolist()) & set(nms_keep)), np.int64)

        num_keep = min(len(keep), max_detection)               # :607-612
        top = np.argsort(-conf_class[keep], kind="stable")[:num_keep]
        keep = keep[top]

        det = np.concatenate([boxes[keep],
                              classid[keep].astype(np.float32)[:, None],
                              conf_class[keep][:, None]], axis=1)
        out[i, :len(det)] = det                                # :615-627
    return out


def np_val_test(det_out: np.ndarray, mask_out: np.ndarray, k: int
                ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """:862-938 — ragged per-image (proposals, sigmoid masks).

    det_out [B, D, 6]; mask_out [B, S, S, k*k].  Padding/degenerate rows are
    dropped via the rounded-extent keep_ix (:876-880); each survivor's mask
    is assembled from explicit k*k cell rectangles (:884-923) and sigmoided.
    """
    det_box, det_mask = [], []
    for i in range(det_out.shape[0]):
        proposals = det_out[i].astype(np.float32)
        pred_masks = mask_out[i].astype(np.float32)
        size = pred_masks.shape[1]

        pred_boxes = np.round(proposals[:, :4] * np.float32(size))
        keep_ix = np.where((pred_boxes[:, 2] - pred_boxes[:, 0] > 0)
                           & (pred_boxes[:, 3] - pred_boxes[:, 1] > 0))[0]
        proposals = proposals[keep_ix]
        pred_boxes = pred_boxes[keep_ix]

        masks = []
        for box in pred_boxes:
            y1, x1, y2, x2 = box
            sub_w = (x2 - x1) / np.float32(k)
            sub_h = (y2 - y1) / np.float32(k)
            grid_x = ([int(x1)]
                      + [int(np.round(x1 + j * sub_w)) for j in range(1, k)]
                      + [int(x2)])
            grid_y = ([int(y1)]
                      + [int(np.round(y1 + j * sub_h)) for j in range(1, k)]
                      + [int(y2)])
            channel = np.zeros((size, size, k * k), np.float32)
            m = 0
            for by in range(k):
                for bx in range(k):
                    channel[grid_y[by]:grid_y[by + 1],
                            grid_x[bx]:grid_x[bx + 1], m] = 1.0
                    m += 1
            logit = (pred_masks * channel).sum(axis=-1)
            masks.append(_sigmoid(logit))
        det_box.append(proposals)
        det_mask.append(np.stack(masks) if masks
                        else np.float32(0.0))                  # :933
    return det_box, det_mask


def np_reference_predict(raws: Sequence[np.ndarray], windows: np.ndarray,
                         anchors: np.ndarray, obj_thresh: float,
                         nms_thresh: float, max_detection: int,
                         num_class: int, k: int):
    """The full composed chain, exactly as the reference's ``evaluation``
    fetch wires it (yolo3_net_pos.py:356-359, :65)."""
    conf_l, class_l, norm_c = np_interpret_output(raws[:3], anchors)
    det_out = np_filter_detections(conf_l, class_l, norm_c, windows,
                                   obj_thresh, nms_thresh, max_detection,
                                   num_class)
    return np_val_test(det_out, np.asarray(raws[3]), k)
