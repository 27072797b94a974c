"""Pallas fused NMS: interpreter-mode parity with the jnp select-suppress."""

import numpy as np
import jax.numpy as jnp

from dis_yolo_tpu.ops.nms import _select_suppress_nms
from dis_yolo_tpu.ops.pallas_nms import nms_pallas


def _case(rng, k):
    b = rng.uniform(0, 1, (k, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]) + .05,
                      np.maximum(b[:, 1], b[:, 3]) + .05], 1)
    scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()
    classes = rng.randint(0, 3, k).astype(np.int32)
    return boxes, scores, classes


def test_matches_jnp(rng):
    for trial in range(8):
        boxes, scores, classes = _case(rng, 64)
        valid = scores > rng.uniform(0.1, 0.6)
        want = np.asarray(_select_suppress_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            jnp.asarray(valid), 0.3, 10))
        got = np.asarray(nms_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            jnp.asarray(valid), 10, 0.3, interpret=True))
        np.testing.assert_array_equal(want, got, err_msg=f"trial {trial}")


def test_all_invalid(rng):
    boxes, scores, classes = _case(rng, 32)
    valid = np.zeros(32, bool)
    got = np.asarray(nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(classes), jnp.asarray(valid),
                                8, 0.3, interpret=True))
    assert (got == -1).all()


def test_duplicate_boxes_suppressed(rng):
    boxes = np.tile(np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32), (16, 1))
    scores = np.linspace(0.9, 0.3, 16).astype(np.float32)
    classes = np.zeros(16, np.int32)
    got = np.asarray(nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(classes),
                                jnp.ones(16, bool), 8, 0.3, interpret=True))
    assert got[0] == 0 and (got[1:] == -1).all()
