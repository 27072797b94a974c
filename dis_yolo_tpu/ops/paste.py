"""Device-side batched mask paste to original image resolution.

The reference finishes inference on the HOST: per detection it crops the
score-map-sized sigmoid mask by the normalized box, bilinear-resizes the
crop to the box's pixel size in the original image, binarizes at 0.5 and
pastes it into a full-resolution canvas (calculate_test_map.py:246-257,
validation_map.py:137-159) — and that stage is part of the published
0.1 s/image (calculate_test_map.py:301-302).

Here the whole stage is a fixed-shape batched device op:

  * the inverse-letterbox box correction (`correct_yolo_boxes`,
    validation_map.py:200-217) is closed-form per detection: offsets/scales
    are static (from image/net sizes), `np.around` == `jnp.round`
    (both half-to-even), clip to the image;
  * crop + bilinear resize + paste collapse into one gather: for every
    output pixel inside the pasted box, the source coordinate in the crop
    window follows cv2 INTER_LINEAR's half-pixel mapping
    src = (dst + 0.5) * crop/box - 0.5 with edge clamping — identical to
    the host `eval.postprocess.paste_mask` / `data.augment.resize_bilinear`
    math — then a 4-tap lerp and a strict > 0.5 binarize;
  * the per-class semantic map ("later detections overwrite earlier",
    calculate_test_map.py:259-267) is a scan over the detection axis.

Everything is vmapped over detections; no host round-trip until the final
bool masks are fetched.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def letterbox_params(image_h: int, image_w: int, net_h: int, net_w: int
                     ) -> Tuple[float, float, float, float]:
    """Static (x_off, x_scale, y_off, y_scale) of the letterbox window.

    Integer-floor math identical to the host `correct_yolo_box`
    (eval/postprocess.py, validation_map.py:200-217).
    """
    if (float(net_w) / image_w) < (float(net_h) / image_h):
        new_w = net_w
        new_h = (image_h * net_w) // image_w
    else:
        new_h = net_h
        new_w = (image_w * net_h) // image_h
    return (float((net_w - new_w) // 2) / net_w, float(new_w) / net_w,
            float((net_h - new_h) // 2) / net_h, float(new_h) / net_h)


def correct_boxes_device(boxes_norm: jnp.ndarray, image_h: int, image_w: int,
                         net_h: int, net_w: int) -> jnp.ndarray:
    """[..., (y1,x1,y2,x2)] normalized letterboxed -> integer original px."""
    x_off, x_scale, y_off, y_scale = letterbox_params(image_h, image_w,
                                                      net_h, net_w)
    y = jnp.round((boxes_norm[..., (0, 2)] - y_off) / y_scale * image_h)
    x = jnp.round((boxes_norm[..., (1, 3)] - x_off) / x_scale * image_w)
    y = jnp.clip(y, 0, image_h).astype(jnp.int32)
    x = jnp.clip(x, 0, image_w).astype(jnp.int32)
    return jnp.stack([y[..., 0], x[..., 0], y[..., 1], x[..., 1]], axis=-1)


def _axis_taps(out_size: int, lo_px: jnp.ndarray, hi_px: jnp.ndarray,
               crop_lo: jnp.ndarray, crop_hi: jnp.ndarray, mask_size: int):
    """Per-output-pixel source taps along one axis.

    Returns (i0, i1, w, inside): absolute score-map indices of the two taps,
    the lerp weight of tap 1, and the inside-box indicator — all [out_size].
    cv2 INTER_LINEAR half-pixel mapping with edge clamping, matching
    `data.augment.resize_bilinear`'s numpy fallback exactly.
    """
    pos = jnp.arange(out_size, dtype=jnp.int32)
    inside = (pos >= lo_px) & (pos < hi_px)
    box_len = jnp.maximum(hi_px - lo_px, 1)
    crop_len = crop_hi - crop_lo                      # may be <= 0: degenerate
    dst = (pos - lo_px).astype(jnp.float32)
    src = (dst + 0.5) * crop_len.astype(jnp.float32) / box_len.astype(jnp.float32) - 0.5
    hi_tap = jnp.maximum(crop_len - 1, 0)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, hi_tap)
    i1 = jnp.clip(i0 + 1, 0, hi_tap)
    w = jnp.clip(src - i0.astype(jnp.float32), 0.0, 1.0)
    i0 = jnp.clip(crop_lo + i0, 0, mask_size - 1)
    i1 = jnp.clip(crop_lo + i1, 0, mask_size - 1)
    return i0, i1, w, inside & (crop_len > 0)


def _axis_matrix(out_size: int, lo_px: jnp.ndarray, hi_px: jnp.ndarray,
                 crop_lo: jnp.ndarray, crop_hi: jnp.ndarray, mask_size: int
                 ) -> jnp.ndarray:
    """Dense one-axis interpolation matrix [out_size, mask_size].

    Row p holds the two bilinear tap weights of output pixel p (zeros
    outside the pasted box), so ``matrix @ mask`` equals the 2-tap gather
    lerp.  Dense matrices turn the resize into MXU matmuls — on TPU the
    per-element gathers are VPU-serial and ~15x slower (BENCHMARKS.md).
    When both taps coincide (single-pixel crops, edge clamping) the
    one-hot contributions sum to (1-w) + w = 1, exactly the gather's value.
    """
    i0, i1, w, inside = _axis_taps(out_size, lo_px, hi_px,
                                   crop_lo, crop_hi, mask_size)
    iota = jnp.arange(mask_size, dtype=jnp.int32)[None, :]
    m = ((iota == i0[:, None]) * (1.0 - w)[:, None]
         + (iota == i1[:, None]) * w[:, None])
    return m * inside[:, None].astype(m.dtype)


def paste_mask_device(mask: jnp.ndarray, box_norm: jnp.ndarray,
                      box_px: jnp.ndarray, image_h: int, image_w: int
                      ) -> jnp.ndarray:
    """One detection: sigmoid mask [S,S] + normalized box + original-px box
    -> bool [image_h, image_w] (crop, bilinear resize, > 0.5, paste).

    Separable bilinear as two dense matmuls: rowM [H0,S] @ mask [S,S]
    @ colM.T [S,W0].  Each matrix row has exactly two non-zero entries (the
    lerp taps), so the products equal the reference 4-tap form: zero terms
    are exact in f32, and HIGHEST precision keeps the TPU's f32 matmul
    decomposition from drifting the > 0.5 knife edge.
    """
    s = mask.shape[0]
    # crop window in score-map pixels (np.around parity, postprocess.py:47-50)
    yn1 = jnp.round(box_norm[0] * s).astype(jnp.int32)
    xn1 = jnp.round(box_norm[1] * s).astype(jnp.int32)
    yn2 = jnp.round(box_norm[2] * s).astype(jnp.int32)
    xn2 = jnp.round(box_norm[3] * s).astype(jnp.int32)
    y1, x1, y2, x2 = box_px[0], box_px[1], box_px[2], box_px[3]

    rowm = _axis_matrix(image_h, y1, y2, yn1, yn2, s)       # [H0, S]
    colm = _axis_matrix(image_w, x1, x2, xn1, xn2, s)       # [W0, S]
    rowmix = jnp.matmul(rowm, mask,
                        precision=jax.lax.Precision.HIGHEST)   # [H0, S]
    val = jnp.matmul(rowmix, colm.T,
                     precision=jax.lax.Precision.HIGHEST)      # [H0, W0]
    return val > 0.5


def paste_masks_single(masks: jnp.ndarray, dets: jnp.ndarray,
                       image_h: int, image_w: int, net_size: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image: masks [D,S,S] sigmoid + dets [D,6] ->
    (full-res bool masks [D, image_h, image_w], valid [D]).

    Validity reproduces the host loop's skips (postprocess.py:74-83):
    zero-score padding rows and boxes degenerate in original pixels.
    """
    box_px = correct_boxes_device(dets[:, :4], image_h, image_w,
                                  net_size, net_size)
    valid = (dets[:, 5] > 0.0) \
        & ((box_px[:, 2] - box_px[:, 0]) * (box_px[:, 3] - box_px[:, 1]) > 0)
    full = jax.vmap(
        lambda m, bn, bp: paste_mask_device(m, bn, bp, image_h, image_w)
    )(masks, dets[:, :4], box_px)
    return full & valid[:, None, None], valid


def merged_semantic_single(full_masks: jnp.ndarray, classids: jnp.ndarray,
                           valid: jnp.ndarray) -> jnp.ndarray:
    """Per-image semantic map: paint classid+1 per detection in order;
    later detections overwrite earlier (calculate_test_map.py:259-267).

    "Last writer wins" as one vectorized reduction: per pixel, the highest
    detection index whose mask covers it picks the class (no D-step scan).
    """
    d = full_masks.shape[0]
    # Encode (detection index, class) in one integer so the last-writer max
    # directly carries the class: enc = (d+1)*256 + cls orders by detection
    # index first (cls < 256), and the winner's class is enc & 255.  A
    # per-pixel lookup into the [D] class table instead costs ~2.5 ms at
    # 576^2 on TPU: XLA lowers tiny-table gathers to a serial SMEM loop
    # (trace: s32[331776] loop fusion + memory-space copies).
    # class ids must stay below the 256 encoding base or they'd bleed into
    # the detection-index field; any DIS-YOLO config has num_class=3, so
    # clip defensively rather than thread cfg through (a >=256-class use
    # would need a wider base here).
    cls = jnp.clip(classids.astype(jnp.int32), 0, 255)
    enc = ((jnp.arange(1, d + 1, dtype=jnp.int32) * 256 + cls)
           * valid.astype(jnp.int32))[:, None, None]         # [D,1,1]
    win = jnp.max(jnp.where(full_masks, enc, 0), axis=0)     # [H,W]
    return jnp.where(win > 0, (win & 255) + 1, 0).astype(jnp.uint8)


def pack_mask_bits(m: jnp.ndarray) -> jnp.ndarray:
    """``np.packbits`` analog on the last axis (bitorder='big'), on device.

    Bool masks fetched to host for evaluation cost 1 byte/pixel on the
    wire; on a network-attached TPU the validation sweep is transfer-bound
    (measured: the device-paste route lost 2.2x to the host route purely
    on fetched bytes, scripts/bench_validate.py).  Packing 8 pixels/byte
    on device cuts the fetch 8x; hosts unpack with
    ``np.unpackbits(..., axis=-1, count=W)`` — an exact round-trip.
    """
    w = m.shape[-1]
    pad = -w % 8
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    m8 = m.reshape(m.shape[:-1] + ((w + pad) // 8, 8))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (m8.astype(jnp.int32) * weights).sum(-1).astype(jnp.uint8)


def unpack_mask_bits(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inverse of ``pack_mask_bits`` on device: uint8 [..., ceil(W/8)] ->
    bool [..., W] (np.unpackbits bitorder='big' convention)."""
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1              # [..., Wb, 8]
    bits = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return bits[..., :width].astype(jnp.bool_)


def mask_iou_single(full_masks: jnp.ndarray, gt_packed: jnp.ndarray,
                    gt_areas: jnp.ndarray) -> jnp.ndarray:
    """Det-vs-GT mask IoU matrix for one image, entirely on device.

    full_masks: [D, H, W] bool (pasted detections);
    gt_packed:  [G, H, ceil(W/8)] uint8 (np.packbits rows);
    gt_areas:   [G] float32 (exact integer pixel counts).
    Returns [D, G] float32, **bit-identical** to the host popcount route
    (eval/voc_eval.packed_overlaps) and to the reference's flatten-dot
    (utils/voc_eval_mask.py:37-54): operands are exactly 0/1 so every
    product is exact even in bf16, the MXU accumulates in float32, and all
    counts are < 2^24 — the final float32 division sees identical integer
    operands on every route.
    """
    h, w = full_masks.shape[1:]
    gt = unpack_mask_bits(gt_packed, w)                   # [G, H, W]
    # 0/1 operands: bf16 halves the HBM traffic of the flattened stacks
    # with zero rounding (0.0/1.0 exact); accumulate f32 on the MXU.
    det_f = full_masks.reshape(full_masks.shape[0], -1).astype(jnp.bfloat16)
    gt_f = gt.reshape(gt.shape[0], -1).astype(jnp.bfloat16)
    inter = jnp.einsum("dp,gp->dg", det_f, gt_f,
                       preferred_element_type=jnp.float32)
    det_area = jnp.sum(full_masks.reshape(full_masks.shape[0], -1),
                       axis=-1, dtype=jnp.float32)        # exact: < 2^24
    union = det_area[:, None] + gt_areas[None, :] - inter
    # guard empty/empty pairs (union 0 -> host route never reads them:
    # zero-area GTs are filtered at rasterization, zero-area dets invalid)
    return inter / jnp.maximum(union, 1.0)


def mask_iou_batch(full_masks: jnp.ndarray, gt_packed: jnp.ndarray,
                   gt_areas: jnp.ndarray) -> jnp.ndarray:
    """Batched ``mask_iou_single``: [B,D,H,W] x [B,G,H,Wb] -> [B,D,G]."""
    return jax.vmap(mask_iou_single)(full_masks, gt_packed, gt_areas)


def semantic_confusion(pred_sem: jnp.ndarray, gt_sem: jnp.ndarray,
                       n: int) -> jnp.ndarray:
    """Per-image semantic confusion totals on device: [H,W] x [H,W] ->
    [n, n] int32 with conf[true, pred] = |{px: gt==true & pred==pred}|.

    One-hot planes contracted on the MXU — 0/1 products are exact and the
    f32 accumulation stays integer below 2^24 px, so the int32 result is
    **bit-identical** to the host bincount pass (eval/map_eval.Evaluator
    .miou, the calculate_test_map.py:304-345 confusion analog).  Fetching
    [n,n] ints instead of the [H,W] semantic map removes the last
    per-pixel wire transfer from a fully device-scored eval sweep.
    """
    labels = jnp.arange(n, dtype=pred_sem.dtype)
    t1 = (gt_sem[None] == labels[:, None, None]).reshape(n, -1)    # [n,HW]
    p1 = (pred_sem[None] == labels[:, None, None]).reshape(n, -1)
    conf = jnp.einsum("tx,px->tp", t1.astype(jnp.bfloat16),
                      p1.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    return conf.astype(jnp.int32)


def paste_masks_batch(masks: jnp.ndarray, dets: jnp.ndarray,
                      image_h: int, image_w: int, net_size: int):
    """Batched full pipeline tail: [B,D,S,S] + [B,D,6] ->
    (bool [B,D,H0,W0], valid [B,D], semantic [B,H0,W0] uint8)."""
    full, valid = jax.vmap(
        lambda m, d: paste_masks_single(m, d, image_h, image_w, net_size)
    )(masks, dets)
    classids = dets[..., 4].astype(jnp.int32)
    sem = jax.vmap(merged_semantic_single)(full, classids, valid)
    return full, valid, sem
