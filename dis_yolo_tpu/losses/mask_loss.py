"""Mask-subnet loss: ROI sampling, GT matching, assembled-mask BCE.

Parity target: reference ``loss_mask`` (yolo3_net_pos.py:750-860), rebuilt
as a fixed-shape batched computation:

  * proposals = the padded [D,4] NMS output; validity = nonzero row (:759)
  * GT = padded [T,5] true boxes + [T,Him,Wim] bool masks; validity =
    nonzero box (:766); GT masks bilinear-resized to the score-map size and
    rounded (:770-775)
  * ROI mix: 7 randomly-chosen valid proposals + 3 randomly-chosen valid GT
    boxes (:781-783) — the reference's ``tf.random_shuffle`` becomes
    ``jax.random``-keyed choice over validity-masked random priorities
  * positives: ROI best-IoU vs GT >= iou_threshold; each positive ROI is
    assigned its argmax GT mask (:787-796)
  * per-ROI loss: BCE between the assembled position-sensitive logits and
    the assigned GT mask, restricted to the box interior and normalized by
    its area; mean over positive ROIs * mask_scale; images with no
    positives contribute 0 (:848-856); final mean over batch (:858)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.ops.boxes import cxcywh_to_yxyx, iou_matrix_yxyx
from dis_yolo_tpu.ops.mask_assembly import assemble_mask_single, box_inside_mask

_N_PROP = 7   # random proposals mixed into the ROI set (:783)
_N_GT = 3     # random GT boxes mixed into the ROI set (:783)


def _bce_with_logits(labels, logits):
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _random_take(key: jax.Array, n_take: int, valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick up to ``n_take`` random indices among ``valid`` entries.

    Returns (indices [n_take], taken_valid [n_take]).  Matches
    ``tf.random_shuffle(x)[:n]`` over the trimmed array: a uniform random
    subset without replacement, fewer if fewer are valid.
    """
    pri = jax.random.uniform(key, valid.shape) - (~valid) * 1e6
    _, idx = jax.lax.top_k(pri, n_take)
    return idx, valid[idx]


def mask_loss_single(key: jax.Array, scoremap: jnp.ndarray, detections: jnp.ndarray,
                     true_boxes: jnp.ndarray, true_masks_small: jnp.ndarray,
                     cfg: DISYoloConfig, iou_threshold: float = 0.5) -> jnp.ndarray:
    """Mask loss for one image.

    scoremap:         [S, S, k*k]
    detections:       [D, 6] padded NMS output (y1, x1, y2, x2, cls, conf)
    true_boxes:       [T, 5] normalized (xc, yc, w, h, classid), zero-padded
    true_masks_small: [T, S, S] float GT masks already resized to the
                      score-map grid and rounded to {0, 1}
    """
    s = scoremap.shape[0]
    k1, k2 = jax.random.split(key)

    proposals = detections[:, :4]
    prop_valid = jnp.sum(jnp.abs(proposals), axis=1) > 0

    gt_xywh = true_boxes[:, :4]
    gt_valid = jnp.sum(jnp.abs(gt_xywh), axis=1) > 0
    gt_boxes = cxcywh_to_yxyx(gt_xywh)                       # [T,4] yxyx

    pidx, pval = _random_take(k1, _N_PROP, prop_valid)
    gidx, gval = _random_take(k2, _N_GT, gt_valid)
    rois = jnp.concatenate([proposals[pidx], gt_boxes[gidx]], axis=0)     # [10,4]
    roi_valid = jnp.concatenate([pval, gval], axis=0)                     # [10]

    overlaps = iou_matrix_yxyx(rois, gt_boxes)               # [10,T]
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    roi_iou_max = jnp.max(overlaps, axis=1)
    positive = roi_valid & (roi_iou_max >= iou_threshold)
    assignment = jnp.argmax(overlaps, axis=1)                # [10]
    roi_gt_mask = true_masks_small[assignment]               # [10,S,S]

    rois_px = jnp.round(rois * float(s))                     # (:842)

    if (cfg.use_pallas_assembly
            and jax.default_backend() not in ("cpu", "gpu")):
        # fused custom-VJP kernel: the jnp gather formulation under autodiff
        # is ~2/3 of the whole train-step gradient time (BENCHMARKS.md)
        from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_trainable
        logits = assemble_masks_trainable(scoremap, rois_px, cfg.k_map)
    else:
        logits = jax.vmap(
            lambda b: assemble_mask_single(scoremap, b, cfg.k_map))(rois_px)
    inside = jax.vmap(lambda b: box_inside_mask(b, s))(rois_px)  # [10,S,S]
    num = jnp.sum(inside * _bce_with_logits(roi_gt_mask, logits), axis=(1, 2))
    den = jnp.maximum(jnp.sum(inside, axis=(1, 2)), 1.0)
    per_roi_loss = num / den                                  # [10]
    n_pos = jnp.sum(positive.astype(jnp.float32))
    mean_pos = jnp.sum(per_roi_loss * positive) / jnp.maximum(n_pos, 1.0)
    return jnp.where(n_pos > 0, cfg.mask_scale * mean_pos, 0.0)


def _tf1_bilinear_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] interpolation matrix with TF1 legacy bilinear sampling.

    TF1's ``tf.image.resize_images`` with its default
    ``align_corners=False`` (and no ``half_pixel_centers``, which TF1
    doesn't have) uses the origin-aligned mapping ``src = dst * in/out``
    with ``lo = floor(src)``, ``hi = min(lo+1, in-1)`` — NOT the
    half-pixel-center mapping ``jax.image.resize`` implements.  After
    ``tf.round`` to {0,1} the two disagree on boundary pixels of every
    training target, so parity requires this sampling exactly
    (tests/test_losses.py checks it against a literal numpy port).
    Expressed as a dense one-hot-weighted matrix so the resize becomes two
    MXU matmuls instead of a gather.
    """
    scale = in_size / out_size
    src = jnp.arange(out_size, dtype=jnp.float32) * scale
    lo = jnp.floor(src).astype(jnp.int32)
    frac = (src - lo.astype(jnp.float32))[:, None]
    hi = jnp.minimum(lo + 1, in_size - 1)
    cols = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    return ((cols == lo[:, None]) * (1.0 - frac)
            + (cols == hi[:, None]) * frac).astype(jnp.float32)


def resize_gt_masks(true_masks: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B?, T, H, W] bool -> float {0,1} at [..., size, size].

    Bilinear resize + round, matching tf.image.resize_images + tf.round
    (yolo3_net_pos.py:773-775) including TF1's legacy origin-aligned
    sampling (see ``_tf1_bilinear_matrix``); separable, so it runs as two
    batched matmuls on the MXU.
    """
    m = true_masks.astype(jnp.float32)
    wh = _tf1_bilinear_matrix(m.shape[-2], size)
    ww = _tf1_bilinear_matrix(m.shape[-1], size)
    # highest precision: TPU f32 matmuls otherwise use bf16 passes, which
    # would perturb interpolation weights at non-integer ratios and flip
    # round() boundary pixels
    out = jnp.einsum("ih,...hw,jw->...ij", wh, m, ww, precision="highest")
    return jnp.round(out)


def mask_loss_per_image(keys: jax.Array, scoremaps: jnp.ndarray,
                        detections: jnp.ndarray, true_boxes: jnp.ndarray,
                        masks_small: jnp.ndarray, cfg: DISYoloConfig,
                        iou_threshold: float = 0.5) -> jnp.ndarray:
    """[B] per-image mask losses from per-image keys + pre-resized GT masks.

    Split out of ``mask_loss`` so the DP train step can run this block
    device-locally under ``shard_map`` (everything here is per-image; see
    train_step._per_image_postprocess for why that matters).
    """
    return jax.vmap(
        lambda kk, sm, det, tb, tm: mask_loss_single(kk, sm, det, tb, tm, cfg, iou_threshold)
    )(keys, scoremaps, detections, true_boxes, masks_small)


def mask_loss(key: jax.Array, scoremaps: jnp.ndarray, detections: jnp.ndarray,
              true_boxes: jnp.ndarray, true_masks: jnp.ndarray,
              cfg: DISYoloConfig, iou_threshold: float = 0.5) -> jnp.ndarray:
    """Batched mask loss.

    scoremaps [B,S,S,k*k]; detections [B,D,6]; true_boxes [B,1,1,1,T,5]
    (reference feed layout) or [B,T,5]; true_masks [B,T,Him,Wim] bool.
    """
    if true_boxes.ndim == 6:
        true_boxes = true_boxes[:, 0, 0, 0]
    s = scoremaps.shape[1]
    masks_small = resize_gt_masks(true_masks, s)
    keys = jax.random.split(key, scoremaps.shape[0])
    per_image = mask_loss_per_image(keys, scoremaps, detections, true_boxes,
                                    masks_small, cfg, iou_threshold)
    return jnp.mean(per_image)
