"""Unit parity tests: box geometry and anchor decode."""

import numpy as np
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.ops import boxes as box_ops
from dis_yolo_tpu.ops.decode import decode_all
import pytest

pytestmark = pytest.mark.quick


def np_iou_matrix(b1, b2):
    """Literal port of overlaps_graph (yolo3_net_pos.py:954-975)."""
    out = np.zeros((len(b1), len(b2)))
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            y1 = max(a[0], b[0]); x1 = max(a[1], b[1])
            y2 = min(a[2], b[2]); x2 = min(a[3], b[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


def test_iou_matrix(rng):
    b1 = rng.uniform(0, 1, (6, 4)).astype(np.float32)
    b2 = rng.uniform(0, 1, (4, 4)).astype(np.float32)
    for b in (b1, b2):
        b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])  # ensure y2>=y1 etc
    got = np.asarray(box_ops.iou_matrix_yxyx(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, np_iou_matrix(b1, b2), rtol=1e-5, atol=1e-6)


def test_clip_boxes():
    boxes = jnp.asarray([[-0.2, 0.1, 0.5, 1.4], [0.3, 0.3, 0.9, 0.8]])
    window = jnp.asarray([0.1, 0.0, 0.8, 1.0])
    got = np.asarray(box_ops.clip_boxes(boxes, window))
    np.testing.assert_allclose(got, [[0.1, 0.1, 0.5, 1.0], [0.3, 0.3, 0.8, 0.8]],
                               rtol=1e-6)


def test_cxcywh_roundtrip(rng):
    b = rng.uniform(0.2, 0.8, (5, 4)).astype(np.float32)
    yxyx = np.asarray(box_ops.cxcywh_to_yxyx(jnp.asarray(b)))
    np.testing.assert_allclose(yxyx[:, 2] - yxyx[:, 0], b[:, 3], rtol=1e-5)
    np.testing.assert_allclose(yxyx[:, 3] - yxyx[:, 1], b[:, 2], rtol=1e-5)
    np.testing.assert_allclose((yxyx[:, 1] + yxyx[:, 3]) / 2, b[:, 0], rtol=1e-5)


def test_decode_closed_form(small_cfg, rng):
    """Decode parity with interpret_output math (yolo3_net_pos.py:465-514)."""
    cfg = small_cfg
    g = cfg.base_grid
    grids = [4 * g, 2 * g, g]
    raws = [jnp.asarray(rng.randn(2, s, s, 3, 5 + cfg.num_class).astype(np.float32) * 0.5)
            for s in grids]
    preds = decode_all(raws, cfg)
    net = g * 32
    anchors = cfg.anchors_array()

    for i, p in enumerate(preds):
        s = grids[i]
        raw = np.asarray(raws[i])
        # pick a few random cells
        for _ in range(10):
            bi, yi, xi, ai = (rng.randint(0, d) for d in (2, s, s, 3))
            t = raw[bi, yi, xi, ai]
            sig = 1 / (1 + np.exp(-t[:2]))
            want_xy = (np.array([xi, yi]) + sig) / s
            want_wh = np.exp(t[2:4]) * anchors[3 * i + ai] / net
            got = np.asarray(p.norm_coord[bi, yi, xi, ai])
            np.testing.assert_allclose(got[:2], want_xy, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got[2:], want_wh, rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(np.asarray(p.coord[bi, yi, xi, ai, :2]),
                                       sig, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(p.conf_logit[bi, yi, xi, ai, 0]),
                                       t[4], rtol=1e-6)
