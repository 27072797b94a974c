"""Fully on-device, fixed-shape detection filtering + class-aware NMS.

Replaces the reference's per-image Python loop with dynamic-shape TF ops
(``filter_detections``, yolo3_net_pos.py:517-628: tf.where / tf.unique /
tf.map_fn over ``tf.image.non_max_suppression`` / tf.sets intersection) with
a batched masked computation:

  1. class-specific confidence = sigmoid(obj) * max softmax(class)
     (yolo3_net_pos.py:544-548)
  2. cxcywh -> yxyx, clip to per-image window (":552-555")
  3. validity = conf > obj_threshold (strict, ":558")
  4. top-K score-sorted shortlist, then ``max_detection`` select-and-
     suppress rounds with *per-class* suppression at IoU > iou_threshold
     (equivalent to ":565-592" greedy order; optional fused Pallas kernel)
  5. the picked survivors come out score-sorted, zero-padded rows of
     (y1, x1, y2, x2, classid, conf) (":607-627")

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


def _select_suppress_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                         classids: jnp.ndarray, valid: jnp.ndarray,
                         iou_thresh: float, max_det: int) -> jnp.ndarray:
    """Class-aware greedy NMS as ``max_det`` select-and-suppress rounds.

    boxes [K,4] yxyx, scores [K], classids [K], valid [K].  Returns the
    indices [max_det] of the kept candidates in descending-score order
    (-1 padding).  Equivalent to sorting by score and greedily keeping
    candidates not suppressed by an earlier same-class keeper (the
    reference's per-class tf.image.non_max_suppression + global top-k,
    yolo3_net_pos.py:565-612): at every round the highest-scoring alive
    candidate is exactly the next greedy survivor.  Only ``max_det``
    sequential steps of O(K) vector work — TPU-friendly, unlike a
    K-iteration triangular elimination.
    """
    iou = box_ops.iou_matrix_yxyx(boxes, boxes)                    # [K,K]
    same_class = classids[:, None] == classids[None, :]
    suppress = (iou > iou_thresh) & same_class                     # [j, i]

    def body(state, _):
        alive, = state
        s = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(s)
        ok = s[j] > -jnp.inf
        alive = alive & jnp.logical_not(suppress[j]) & (jnp.arange(len(scores)) != j)
        alive = jnp.where(ok, alive, jnp.zeros_like(alive))
        return (alive,), jnp.where(ok, j, -1)

    (_,), picked = jax.lax.scan(body, (valid,), None, length=max_det)
    return picked                                                   # [max_det]


def _select_suppress_nms_full(boxes: jnp.ndarray, scores: jnp.ndarray,
                              classids: jnp.ndarray, valid: jnp.ndarray,
                              iou_thresh: float, max_det: int) -> jnp.ndarray:
    """Exact greedy NMS over the FULL candidate set, matrix-free.

    Same semantics as ``_select_suppress_nms`` but the winner's IoU row is
    computed on the fly each round (O(N) per round, ``max_det`` rounds) —
    no K x K matrix, so it scales to all ~20k anchors of a 576px image.
    Used as the lossless fallback when the top-K shortlist underfills.
    """
    n = scores.shape[0]
    idx = jnp.arange(n)

    def body(alive, _):
        s = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(s)
        ok = s[j] > -jnp.inf
        row = box_ops.iou_matrix_yxyx(boxes[j][None], boxes)[0]     # [N]
        suppress = (row > iou_thresh) & (classids == classids[j])
        alive = alive & jnp.logical_not(suppress) & (idx != j)
        alive = jnp.where(ok, alive, jnp.zeros_like(alive))
        return alive, jnp.where(ok, j, -1)

    _, picked = jax.lax.scan(body, valid, None, length=max_det)
    return picked                                                   # [max_det]


def _fixpoint_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                  classids: jnp.ndarray, valid: jnp.ndarray,
                  iou_thresh: float, max_det: int) -> jnp.ndarray:
    """Exact greedy NMS as a convergence iteration (TPU latency-friendly).

    Greedy NMS's keep set is the unique fixpoint of
        kept[i] = valid[i] and no kept j with higher score suppresses i
    (induction over score rank).  Iterating that recurrence corrects all
    candidates of suppression-chain depth <= m after m sweeps, so a
    ``while_loop`` until stable needs only ~2-4 data-dependent O(K^2)
    matrix sweeps instead of ``max_det`` (=30) serial argmax rounds —
    each sweep is one masked any-reduction on the VPU.  Returns the same
    descending-score -1-padded indices as ``_select_suppress_nms``.
    """
    iou = box_ops.iou_matrix_yxyx(boxes, boxes)
    same_class = classids[:, None] == classids[None, :]
    # j beats i: higher score, or equal score and lower index (the scan's
    # argmax tie-break picks the first maximum)
    idx = jnp.arange(scores.shape[0])
    beats = (scores[:, None] > scores[None, :]) \
        | ((scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :]))
    suppress = (iou > iou_thresh) & same_class & beats        # [j, i]

    def sweep(kept):
        return valid & ~jnp.any(suppress & kept[:, None], axis=0)

    # carry (kept, prev) instead of (kept, changed_flag): a literal True
    # init flag is vma-unvarying while the body output is varying, which
    # shard_map's while_loop typing rejects; two valid-derived arrays stay
    # consistently varying and cost one extra any-reduction per sweep.
    def cond(state):
        kept, prev = state
        return jnp.any(kept != prev)

    def body(state):
        kept, _ = state
        return sweep(kept), kept

    kept, _ = jax.lax.while_loop(cond, body, (sweep(valid), valid))

    k = min(max_det, scores.shape[0])
    top_score, top_idx = jax.lax.top_k(jnp.where(kept, scores, -jnp.inf), k)
    picked = jnp.where(top_score > -jnp.inf, top_idx, -1)
    if k < max_det:
        picked = jnp.concatenate(
            [picked, jnp.full((max_det - k,), -1, picked.dtype)])
    return picked


def _score_class_boxes(conf, class_prob, coord_cxcywh, window):
    """Shared head: per-candidate score/class/clipped boxes (one image)."""
    classid = jnp.argmax(class_prob, axis=-1).astype(jnp.int32)      # [N]
    class_max = jnp.max(class_prob, axis=-1)
    score = conf * class_max                                          # [N]
    boxes = box_ops.cxcywh_to_yxyx(coord_cxcywh)
    boxes = box_ops.clip_boxes(boxes, window)
    return score, classid, boxes


def _rows_from_picked(picked, boxes, classid, score, d):
    """-1-padded candidate indices -> zero-padded [D,6] detection rows."""
    safe = jnp.maximum(picked, 0)
    out_valid = picked >= 0
    det = jnp.concatenate([
        boxes[safe],
        classid[safe].astype(jnp.float32)[:, None],
        score[safe][:, None],
    ], axis=-1)
    return jnp.where(out_valid[:, None], det, 0.0)                    # [D,6]


def _shortlist_nms_single(conf, class_prob, coord_cxcywh, window,
                          cfg: DISYoloConfig, obj_thresh):
    """Fast path for one image: top-K shortlist NMS.

    Returns ([D,6] detections, shortfall flag).  Greedy NMS is
    prefix-stable in score order, so the K-shortlist result equals
    unbounded NMS unless it underfilled ``max_detection`` while >K
    candidates were above threshold (the keepers beyond rank K were never
    seen) — the flag marks exactly that case.
    """
    score, classid, boxes = _score_class_boxes(conf, class_prob,
                                               coord_cxcywh, window)
    valid = score > obj_thresh

    k = min(cfg.pre_nms_top_k, score.shape[0])
    masked_score = jnp.where(valid, score, -1.0)
    top_score, top_idx = jax.lax.top_k(masked_score, k)
    top_boxes = boxes[top_idx]
    top_class = classid[top_idx]
    top_valid = top_score > obj_thresh

    d = cfg.max_detection
    if cfg.use_pallas_nms and jax.default_backend() not in ("cpu", "gpu"):
        from dis_yolo_tpu.ops.pallas_nms import nms_pallas
        picked_local = nms_pallas(top_boxes, top_score, top_class, top_valid,
                                  d, cfg.iou_threshold)               # [D]
    elif cfg.nms_engine == "fixpoint":
        picked_local = _fixpoint_nms(top_boxes, top_score, top_class,
                                     top_valid, cfg.iou_threshold, d)
    else:
        picked_local = _select_suppress_nms(top_boxes, top_score, top_class,
                                            top_valid, cfg.iou_threshold, d)
    # map shortlist picks back to full-array candidate indices
    picked = jnp.where(picked_local >= 0,
                       top_idx[jnp.maximum(picked_local, 0)], -1)
    shortfall = jnp.any(picked_local < 0) & (jnp.sum(valid) > k)
    return _rows_from_picked(picked, boxes, classid, score, d), shortfall


def _full_nms_single(conf, class_prob, coord_cxcywh, window,
                     cfg: DISYoloConfig, obj_thresh):
    """Exact unbounded-candidate pass (matrix-free) for one image."""
    score, classid, boxes = _score_class_boxes(conf, class_prob,
                                               coord_cxcywh, window)
    valid = score > obj_thresh
    picked = _select_suppress_nms_full(boxes, score, classid, valid,
                                       cfg.iou_threshold, cfg.max_detection)
    return _rows_from_picked(picked, boxes, classid, score, cfg.max_detection)


def filter_detections_single(conf: jnp.ndarray, class_prob: jnp.ndarray,
                             coord_cxcywh: jnp.ndarray, window: jnp.ndarray,
                             cfg: DISYoloConfig, obj_thresh) -> jnp.ndarray:
    """One image: [N] conf, [N,C] probs, [N,4] cxcywh, [4] window -> [D,6].

    Lossless for any ``pre_nms_top_k``: the rare shortlist underfill falls
    back to the exact full-candidate pass (tests/test_nms.py boundary
    tests).  NOTE: do not ``vmap`` this function — under vmap ``lax.cond``
    lowers to a select that executes BOTH branches every call, paying the
    full pass always; use ``filter_detections``, which hoists the fallback
    decision to one batch-level scalar cond.
    """
    det, shortfall = _shortlist_nms_single(conf, class_prob, coord_cxcywh,
                                           window, cfg, obj_thresh)
    return jax.lax.cond(
        shortfall,
        lambda: _full_nms_single(conf, class_prob, coord_cxcywh, window,
                                 cfg, obj_thresh),
        lambda: det)


def filter_detections(preds: Sequence[ScalePrediction], windows: jnp.ndarray,
                      cfg: DISYoloConfig, obj_thresh=None) -> jnp.ndarray:
    """Batched detection head: ScalePredictions + [B,4] windows -> [B,D,6]."""
    if obj_thresh is None:
        obj_thresh = cfg.obj_threshold
    conf, prob, coord = flatten_predictions(preds)
    dets, shortfall = jax.vmap(
        lambda c, p, x, w: _shortlist_nms_single(c, p, x, w, cfg, obj_thresh)
    )(conf, prob, coord, windows)
    # batch-level scalar cond: a true branch under jit, so the expensive
    # exact pass costs nothing unless some image actually underfilled
    return jax.lax.cond(
        jnp.any(shortfall),
        lambda: jnp.where(
            shortfall[:, None, None],
            jax.vmap(lambda c, p, x, w: _full_nms_single(c, p, x, w, cfg,
                                                         obj_thresh)
                     )(conf, prob, coord, windows),
            dets),
        lambda: dets)
