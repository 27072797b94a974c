"""Composed end-to-end inference parity: ``api.predict`` vs a literal numpy
port of ``interpret_output -> filter_detections -> val_test``
(yolo3_net_pos.py:465-628, :862-938; chain wiring :356-359, :65).

Per-op parity tests can hide rounding/ordering drift between stages; these
run the whole chain from identical raw tensors — once at full 576-derived
shapes (grids 72/36/18, S=288) where the quantization actually lands, and
once through the real model forward on random weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from tests.np_reference_chain import np_reference_predict


def _compare(cfg, dets, masks, ora_boxes, ora_masks, atol=2e-5):
    """Our padded [B,D,6]/[B,D,S,S] vs the oracle's ragged per-image lists."""
    dets, masks = np.asarray(dets), np.asarray(masks)
    for i in range(dets.shape[0]):
        valid = dets[i, :, 5] > 0.0
        got_rows = dets[i][valid]
        want_rows = ora_boxes[i]
        assert got_rows.shape == want_rows.shape, (
            f"image {i}: keep-set size {got_rows.shape} vs oracle "
            f"{want_rows.shape}")
        np.testing.assert_allclose(got_rows[:, :4], want_rows[:, :4],
                                   rtol=0, atol=atol,
                                   err_msg=f"image {i} boxes")
        np.testing.assert_array_equal(got_rows[:, 4], want_rows[:, 4],
                                      err_msg=f"image {i} class ids")
        np.testing.assert_allclose(got_rows[:, 5], want_rows[:, 5],
                                   rtol=0, atol=atol,
                                   err_msg=f"image {i} scores")
        if want_rows.shape[0]:
            got_masks = masks[i][valid]
            np.testing.assert_allclose(got_masks, ora_masks[i],
                                       rtol=0, atol=atol,
                                       err_msg=f"image {i} masks")


def _random_raws(rng, cfg, batch):
    g = cfg.image_size // 32
    s = cfg.image_size // cfg.mask_stride
    c = 5 + cfg.num_class
    raws = [rng.randn(batch, 4 * g, 4 * g, 3, c).astype(np.float32),
            rng.randn(batch, 2 * g, 2 * g, 3, c).astype(np.float32),
            rng.randn(batch, g, g, 3, c).astype(np.float32),
            rng.randn(batch, s, s, cfg.k_map ** 2).astype(np.float32)]
    return raws


def test_composed_chain_full_576_shapes(rng):
    """Full production shapes: grids 72/36/18, score maps 288x288.  The raw
    tensors are synthetic (tie-free by construction of continuous RNG), so
    the test isolates the composed postprocess chain at the exact resolution
    where every rounding choice lands."""
    cfg = DISYoloConfig()  # image_size 576, pre_nms_top_k 512
    raws = _random_raws(rng, cfg, batch=2)
    windows = np.array([[0.0, 0.0, 1.0, 1.0],
                        [0.1, 0.05, 0.9, 0.95]], np.float32)

    dets, masks = jax.jit(
        lambda r, w: api.predict_from_outputs(cfg, r, w)
    )([jnp.asarray(r) for r in raws], jnp.asarray(windows))

    ora_boxes, ora_masks = np_reference_predict(
        raws, windows, cfg.anchors_array(), cfg.obj_threshold,
        cfg.iou_threshold, cfg.max_detection, cfg.num_class, cfg.k_map)

    # sanity: real detections must flow (all-padding would prove nothing)
    assert sum(b.shape[0] for b in ora_boxes) >= 10
    _compare(cfg, dets, masks, ora_boxes, ora_masks)


def test_composed_chain_real_model_forward(rng, small_cfg):
    """End-to-end through ``api.predict`` itself: the real model forward on
    random weights feeds both our chain and the numpy oracle (raws captured
    once, so any drift is in the decode/NMS/assembly composition)."""
    cfg = small_cfg
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(3))
    images = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0],
                           [0.0, 0.1, 1.0, 0.9]], np.float32)
    # random-weight conf sits near sigmoid(0)*softmax_max ~ 0.17 < 0.25, so
    # lower the threshold to push real detections through the chain
    thresh = 1e-3

    dets, masks = api.predict(model, variables, images, windows,
                              obj_thresh=thresh)

    raws = api.forward(model, variables, images, train=False)
    raws = [np.asarray(r, np.float32) for r in raws]
    ora_boxes, ora_masks = np_reference_predict(
        raws, np.asarray(windows), cfg.anchors_array(), thresh,
        cfg.iou_threshold, cfg.max_detection, cfg.num_class, cfg.k_map)

    assert sum(b.shape[0] for b in ora_boxes) >= 2
    _compare(cfg, dets, masks, ora_boxes, ora_masks)
