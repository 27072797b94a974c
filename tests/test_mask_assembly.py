"""Mask-assembly parity: closed-form gather vs a literal numpy port of the
reference's cell-map construction (yolo3_net_pos.py:799-845)."""

import numpy as np
import jax.numpy as jnp

from dis_yolo_tpu.ops import mask_assembly as ma
import pytest

pytestmark = pytest.mark.quick


def reference_assemble(scoremap: np.ndarray, box_px: np.ndarray, k: int) -> np.ndarray:
    """Literal numpy transcription of assemble_kmask_from_box + reduction.

    scoremap [S,S,k*k]; box_px already rounded (y1,x1,y2,x2) floats.
    Builds the k*k zero/one cell maps exactly like the reference's
    tf.zeros/tf.ones/tf.concat construction, then sums scoremap * cellmask.
    """
    size = scoremap.shape[0]
    y1, x1, y2, x2 = box_px
    sub_w = (x2 - x1) / k
    sub_h = (y2 - y1) / k
    gx = [int(x1)] + [int(np.around(x1 + i * sub_w)) for i in range(1, k)] + [int(x2)]
    gy = [int(y1)] + [int(np.around(y1 + i * sub_h)) for i in range(1, k)] + [int(y2)]

    out = np.zeros((size, size), np.float32)
    ch = 0
    for by in range(k):
        for bx in range(k):
            cell = np.zeros((size, size), np.float32)
            cell[gy[by]:gy[by + 1], gx[bx]:gx[bx + 1]] = 1.0
            out += scoremap[:, :, ch] * cell
            ch += 1
    return out


def test_matches_reference_construction(rng):
    size, k = 48, 3
    scoremap = rng.randn(size, size, k * k).astype(np.float32)
    boxes_px = np.array([
        [3, 5, 40, 44],
        [0, 0, 48, 48],
        [10, 10, 13, 12],   # tiny box
        [7, 7, 8, 8],       # single-pixel
        [20, 30, 20, 35],   # zero-height -> empty
    ], np.float32)

    got = np.asarray(ma.assemble_masks(jnp.asarray(scoremap),
                                       jnp.asarray(boxes_px / size), k))
    for i, b in enumerate(boxes_px):
        want = reference_assemble(scoremap, b, k)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"box {i}")


def test_random_boxes_parity(rng):
    size, k = 64, 3
    scoremap = rng.randn(size, size, k * k).astype(np.float32)
    for _ in range(25):
        y1, x1 = rng.randint(0, size - 1, 2)
        y2 = rng.randint(y1 + 1, size + 1)
        x2 = rng.randint(x1 + 1, size + 1)
        b = np.array([y1, x1, y2, x2], np.float32)
        got = np.asarray(ma.assemble_mask_single(jnp.asarray(scoremap),
                                                 jnp.asarray(b), k))
        want = reference_assemble(scoremap, b, k)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fractional_box_rounding(rng):
    """Normalized boxes go through round(box*S) with ties-to-even."""
    size, k = 48, 3
    scoremap = rng.randn(size, size, k * k).astype(np.float32)
    boxes_norm = rng.uniform(0, 1, (10, 4)).astype(np.float32)
    boxes_norm = np.stack([
        np.minimum(boxes_norm[:, 0], boxes_norm[:, 2]),
        np.minimum(boxes_norm[:, 1], boxes_norm[:, 3]),
        np.maximum(boxes_norm[:, 0], boxes_norm[:, 2]),
        np.maximum(boxes_norm[:, 1], boxes_norm[:, 3]),
    ], axis=1)
    got = np.asarray(ma.assemble_masks(jnp.asarray(scoremap),
                                       jnp.asarray(boxes_norm), k))
    for i in range(len(boxes_norm)):
        want = reference_assemble(scoremap, np.around(boxes_norm[i] * size), k)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_inside_mask_equals_cell_sum(rng):
    size, k = 48, 3
    b = np.array([4, 6, 37, 41], np.float32)
    ones = np.ones((size, size, k * k), np.float32)
    want = reference_assemble(ones, b, k)  # sum of cell masks
    got = np.asarray(ma.box_inside_mask(jnp.asarray(b), size))
    np.testing.assert_allclose(got, want)


def test_k5_variant(rng):
    """k=5 (commented variant in the reference, :814-817) also matches."""
    size, k = 60, 5
    scoremap = rng.randn(size, size, k * k).astype(np.float32)
    b = np.array([2, 3, 55, 49], np.float32)
    got = np.asarray(ma.assemble_mask_single(jnp.asarray(scoremap), jnp.asarray(b), k))
    want = reference_assemble(scoremap, b, k)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_k7_variant(rng):
    """k=7 (commented variant, :818-823) vs the literal reference
    construction — anchors the k=7 chain that test_pallas_assembly's
    k-variant tests compare only against this jnp path."""
    size, k = 84, 7
    scoremap = rng.randn(size, size, k * k).astype(np.float32)
    boxes = np.array([
        [2, 3, 79, 71],
        [0, 0, 84, 84],
        [10, 11, 19, 17],   # box smaller than k pixels per cell
        [5, 5, 6, 6],       # single-pixel
    ], np.float32)
    for b in boxes:
        got = np.asarray(ma.assemble_mask_single(jnp.asarray(scoremap),
                                                 jnp.asarray(b), k))
        want = reference_assemble(scoremap, b, k)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
