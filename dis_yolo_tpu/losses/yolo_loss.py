"""Three-scale YOLOv3 detection loss (confidence / class / coordinates).

Parity target: reference ``loss_yolo`` (yolo3_net_pos.py:631-747):

  * ignore mask: for every predicted box, best IoU against the padded
    ``true_boxes`` list; no-object confidence loss is dropped where
    best_iou >= IGNORE_THRESH (:657-680)
  * conf loss  = obj * BCE * object_scale + noobj * ignore * BCE *
    noobject_scale, summed over grid and meaned over batch (:685-695)
  * class loss = sparse softmax CE at object cells (:697-703)
  * coord loss = MSE on (sigmoid-space cxy, log-space twh) with the
    (2 - w*h)^2 size-sensitive scale (:705-727); twh targets log-clipped to
    +-1e2 (:718)

All terms are computed per scale on fixed-shape tensors and summed; no
Python loops over the batch.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.ops.boxes import iou_cxcywh_pairwise
from dis_yolo_tpu.ops.decode import ScalePrediction, cell_offsets


def _bce_with_logits(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.sigmoid_cross_entropy_with_logits parity."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _softmax_ce(labels_idx: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.sparse_softmax_cross_entropy_with_logits parity."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels_idx[..., None], axis=-1)[..., 0]
    return logz - picked


def yolo_loss(preds: Sequence[ScalePrediction], true_boxes: jnp.ndarray,
              labels: Sequence[jnp.ndarray], cfg: DISYoloConfig
              ) -> Dict[str, jnp.ndarray]:
    """Compute the YOLO loss over the three scales.

    preds: decoded ScalePredictions, index 0 = stride-8 scale.
    true_boxes: [B, 1, 1, 1, T, 5] normalized (xc, yc, w, h, classid),
      zero rows = padding (same layout the reference feeds, config cap T=20).
    labels: per-scale targets [B, H, W, A, 5+C] ordered like ``preds``
      (i.e. labels[0] = yolo3 stride-8 grid — reference ``labels_value``
      list order, yolo3_net_pos.py:55).
    Returns dict of scalar losses: conf / class / coord components and the
    monitoring splits, all already scale-weighted.
    """
    net_hw = jnp.asarray(
        [preds[2].conf_logit.shape[2] * 32, preds[2].conf_logit.shape[1] * 32],
        jnp.float32)                                   # (net_w, net_h)
    true_xywh = true_boxes[..., 0:4]                   # [B,1,1,1,T,4]

    objloss = noobjloss = xyloss = whloss = 0.0
    confloss = classloss = coordloss = 0.0

    for i, p in enumerate(preds):
        grid_h, grid_w = p.conf_logit.shape[1], p.conf_logit.shape[2]
        grid_factor = jnp.asarray([grid_w, grid_h], jnp.float32)

        # ---- ignore mask from IoU vs every (padded) true box ----
        pred_xywh = p.norm_coord[..., None, :]        # [B,H,W,A,1,4]
        iou = iou_cxcywh_pairwise(pred_xywh, true_xywh)   # [B,H,W,A,T]
        best_iou = jnp.max(iou, axis=-1)
        ignore = (best_iou < cfg.ignore_thresh).astype(jnp.float32)[..., None]

        label = labels[i]
        object_mask = label[..., 4:5]
        noobject_mask = 1.0 - object_mask

        # ---- 1. confidence ----
        bce = _bce_with_logits(object_mask, p.conf_logit)
        obj_l = jnp.mean(jnp.sum(object_mask * bce * cfg.object_scale, axis=(1, 2, 3, 4)))
        noobj_l = jnp.mean(jnp.sum(noobject_mask * ignore * bce * cfg.noobject_scale,
                                   axis=(1, 2, 3, 4)))

        # ---- 2. classification ----
        true_cls = jnp.argmax(label[..., 5:], axis=-1)
        ce = _softmax_ce(true_cls, p.class_logit)[..., None]
        class_l = jnp.mean(jnp.sum(object_mask * ce * cfg.class_scale, axis=(1, 2, 3, 4)))

        # ---- 3. coordinates ----
        pred_cxy = p.coord[..., 0:2]
        pred_twh = p.coord[..., 2:4]
        offs = cell_offsets(grid_h, grid_w)           # [1,H,W,1,2]
        true_cxy = label[..., 0:2] * grid_factor - offs
        true_twh_px = label[..., 2:4] * net_hw
        true_twh = jnp.clip(
            jnp.log(jnp.where(object_mask > 0, true_twh_px, 1.0)
                    / p.anchors[None, None, None, :, :]),
            -1e2, 1e2)
        wh_scale = (2.0 - label[..., 2] * label[..., 3])[..., None]
        cxy_d = object_mask * (pred_cxy - true_cxy)
        twh_d = object_mask * (pred_twh - true_twh)
        xy_l = jnp.mean(jnp.sum(jnp.square(cxy_d) * jnp.square(wh_scale) * cfg.coord_scale,
                                axis=(1, 2, 3, 4)))
        wh_l = jnp.mean(jnp.sum(jnp.square(twh_d) * jnp.square(wh_scale) * cfg.coord_scale,
                                axis=(1, 2, 3, 4)))

        objloss += obj_l
        noobjloss += noobj_l
        xyloss += xy_l
        whloss += wh_l
        confloss += obj_l + noobj_l
        classloss += class_l
        coordloss += xy_l + wh_l

    return {
        "conf_loss": confloss, "class_loss": classloss, "coord_loss": coordloss,
        "object_loss": objloss, "noobject_loss": noobjloss,
        "xy_loss": xyloss, "wh_loss": whloss,
    }
