"""Device-side mask paste vs the host postprocess oracle.

The device op (ops/paste.py) must reproduce the host chain
``correct_yolo_box -> crop -> bilinear resize -> >0.5 -> paste``
(eval/postprocess.py, itself parity-tested against
calculate_test_map.py:232-267) bit-for-bit up to fp associativity at the
binarize threshold.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dis_yolo_tpu.data.augment import resize_bilinear
from dis_yolo_tpu.eval.postprocess import correct_yolo_box, detections_to_original
from dis_yolo_tpu.ops import paste

pytestmark = pytest.mark.quick


def _dyadic_boxes(rng, n, q=256):
    """Random valid yxyx boxes quantized to 1/q with q a power of two, so
    coordinates are exactly representable in BOTH f32 (device) and f64
    (host) and any .5 rounding tie is a true tie on both sides (both round
    half-to-even)."""
    lo = rng.randint(0, q - 24, (n, 2)) / q
    hi = lo + rng.randint(12, 24, (n, 2)) / q
    return np.concatenate([lo, np.minimum(hi, 1.0)], 1)[:, [0, 1, 2, 3]].astype(np.float32)


# letterbox geometries whose offsets/scales are dyadic (exact in f32): the
# square case and 2:1 letterboxes (off 0.25, scale 0.5)
@pytest.mark.parametrize("image_hw", [(96, 96), (192, 96), (96, 192)])
def test_correct_boxes_device_matches_host_exact(rng, image_hw):
    ih, iw = image_hw
    net = 96
    boxes = _dyadic_boxes(rng, 64)
    got = np.asarray(paste.correct_boxes_device(jnp.asarray(boxes), ih, iw,
                                                net, net))
    for i, b in enumerate(boxes):
        x1, y1, x2, y2 = correct_yolo_box(float(b[1]), float(b[0]),
                                          float(b[3]), float(b[2]),
                                          ih, iw, net, net)
        np.testing.assert_array_equal(got[i], [y1, x1, y2, x2],
                                      err_msg=f"box {i} = {b}")


@pytest.mark.parametrize("image_hw", [(96, 160), (131, 77)])
def test_correct_boxes_device_matches_host_nondyadic(rng, image_hw):
    """Non-dyadic letterbox offsets: f32 (device) and f64 (host) can land on
    opposite sides of a rounding knife edge — allow ±1 px there only."""
    ih, iw = image_hw
    net = 96
    boxes = rng.uniform(0, 1, (64, 4)).astype(np.float32)
    boxes[:, 2:] = np.minimum(boxes[:, :2] + 0.1, 1.0)
    got = np.asarray(paste.correct_boxes_device(jnp.asarray(boxes), ih, iw,
                                                net, net))
    x_off, x_scale, y_off, y_scale = paste.letterbox_params(ih, iw, net, net)
    for i, b in enumerate(boxes):
        x1, y1, x2, y2 = correct_yolo_box(float(b[1]), float(b[0]),
                                          float(b[3]), float(b[2]),
                                          ih, iw, net, net)
        raw = np.array([(float(b[0]) - y_off) / y_scale * ih,
                        (float(b[1]) - x_off) / x_scale * iw,
                        (float(b[2]) - y_off) / y_scale * ih,
                        (float(b[3]) - x_off) / x_scale * iw])
        knife = np.abs(raw - np.floor(raw) - 0.5) < 1e-4
        want = np.array([y1, x1, y2, x2])
        exact = got[i] == want
        assert np.all(exact | (knife & (np.abs(got[i] - want) <= 1))), (
            f"box {i} = {b}: got {got[i]} want {want} raw {raw}")


def _host_float_canvas(mask, box_norm, box_px, ih, iw):
    """paste_mask's arithmetic, stopped before binarize (for boundary-pixel
    tolerance checks)."""
    x1, y1, x2, y2 = box_px
    size = mask.shape[0]
    yn1 = int(np.around(box_norm[0] * size))
    xn1 = int(np.around(box_norm[1] * size))
    yn2 = int(np.around(box_norm[2] * size))
    xn2 = int(np.around(box_norm[3] * size))
    crop = mask[yn1:yn2, xn1:xn2]
    canvas = np.zeros((ih, iw), np.float32)
    if crop.size == 0 or (y2 - y1) * (x2 - x1) <= 0:
        return canvas
    canvas[y1:y2, x1:x2] = resize_bilinear(
        np.ascontiguousarray(crop, np.float32), x2 - x1, y2 - y1)
    return canvas


@pytest.mark.parametrize("image_hw", [(96, 96), (192, 96)])
def test_paste_masks_matches_host(rng, image_hw):
    ih, iw = image_hw
    net, s, d = 96, 48, 12
    boxes = _dyadic_boxes(rng, d)
    dets = np.zeros((d, 6), np.float32)
    dets[:, :4] = boxes
    dets[:, 4] = rng.randint(0, 3, d)
    dets[:, 5] = rng.uniform(0.3, 1.0, d)
    dets[3] = 0.0            # padding row
    dets[7, :4] = [0.5, 0.5, 0.5 + 1e-4, 0.5 + 1e-4]  # degenerate box
    # sharp masks keep interpolated values away from the 0.5 knife edge
    masks = 1.0 / (1.0 + np.exp(-5.0 * rng.randn(d, s, s).astype(np.float32)))

    full, valid, sem = (np.asarray(a) for a in paste.paste_masks_batch(
        jnp.asarray(masks[None]), jnp.asarray(dets[None]), ih, iw, net))
    full, valid, sem = full[0], valid[0], sem[0]

    want_sem = np.zeros((ih, iw), np.uint8)
    insts = detections_to_original(dets, masks, ih, iw, net, want_sem)

    # host skip logic == device validity
    kept_rows = [k for k in range(d)
                 if dets[k, 5] > 0.0
                 and np.prod(np.subtract(
                     correct_yolo_box(dets[k, 1], dets[k, 0], dets[k, 3],
                                      dets[k, 2], ih, iw, net, net)[2:],
                     correct_yolo_box(dets[k, 1], dets[k, 0], dets[k, 3],
                                      dets[k, 2], ih, iw, net, net)[:2])) > 0]
    assert valid.sum() == len(insts) == len(kept_rows)

    for inst, k in zip(insts, kept_rows):
        got = full[k]
        want = inst["mask"]
        mismatch = got != want
        if mismatch.any():
            # only binarize knife-edge pixels may differ (fp associativity)
            x1, y1, x2, y2 = inst["box"]
            hostf = _host_float_canvas(masks[k], dets[k, :4],
                                       (x1, y1, x2, y2), ih, iw)
            assert np.all(np.abs(hostf[mismatch] - 0.5) < 1e-3), (
                f"row {k}: {mismatch.sum()} non-boundary mismatches")
    np.testing.assert_array_equal(sem, want_sem)


def test_paste_empty_and_degenerate(rng):
    """All-padding detections produce empty masks and a zero semantic map."""
    ih = iw = net = 96
    s, d = 48, 6
    dets = np.zeros((d, 6), np.float32)
    masks = np.full((d, s, s), 0.9, np.float32)
    full, valid, sem = (np.asarray(a) for a in paste.paste_masks_batch(
        jnp.asarray(masks[None]), jnp.asarray(dets[None]), ih, iw, net))
    assert not valid.any() and not full.any() and not sem.any()


def test_paste_identity_box(rng):
    """A full-window box at net==image size: binarized upsample of the mask."""
    ih = iw = net = 96
    s = 48
    mask = np.zeros((s, s), np.float32)
    mask[10:20, 14:30] = 0.9
    dets = np.zeros((1, 6), np.float32)
    dets[0] = [0.0, 0.0, 1.0, 1.0, 0.0, 0.9]
    full, valid, _ = (np.asarray(a) for a in paste.paste_masks_batch(
        jnp.asarray(mask[None, None]), jnp.asarray(dets[None]), ih, iw, net))
    want = detections_to_original(dets, mask[None], ih, iw, net)[0]["mask"]
    np.testing.assert_array_equal(full[0, 0], want)


def test_pack_mask_bits_matches_np_packbits(rng):
    """Device bit-packing is an exact np.packbits (bitorder='big') analog,
    including non-multiple-of-8 widths; unpackbits(count=W) round-trips."""
    for w in (64, 75, 600, 13):
        m = rng.rand(3, 5, 17, w) > 0.5
        got = np.asarray(paste.pack_mask_bits(jnp.asarray(m)))
        want = np.packbits(m, axis=-1)
        np.testing.assert_array_equal(got, want)
        back = np.unpackbits(got, axis=-1, count=w).astype(bool)
        np.testing.assert_array_equal(back, m)
