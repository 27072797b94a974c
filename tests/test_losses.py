"""Loss parity tests: BCE/CE formulations, ignore mask, coord scaling,
mask-loss ROI semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.losses import mask_loss as ml
from dis_yolo_tpu.losses import yolo_loss as yl
from dis_yolo_tpu.ops.decode import decode_all

pytestmark = pytest.mark.quick


def test_bce_matches_tf_formula(rng):
    x = rng.randn(100).astype(np.float32) * 5
    labels = (rng.rand(100) > 0.5).astype(np.float32)
    got = np.asarray(yl._bce_with_logits(jnp.asarray(labels), jnp.asarray(x)))
    # Oracle in float64: the naive 1-sigmoid loses ~5 decimal digits in
    # float32 once |x| > 13 (1-sig falls below the ULP of 1.0), and the
    # session-scoped rng fixture makes the draw order-dependent across the
    # suite — a large sample must not fail the stable-formula implementation.
    x64 = x.astype(np.float64)
    sig = 1 / (1 + np.exp(-x64))
    want = -(labels * np.log(sig + 1e-300)
             + (1 - labels) * np.log(1 - sig + 1e-300))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_softmax_ce(rng):
    logits = rng.randn(50, 3).astype(np.float32)
    labels = rng.randint(0, 3, 50)
    got = np.asarray(yl._softmax_ce(jnp.asarray(labels), jnp.asarray(logits)))
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    want = -np.log(p[np.arange(50), labels])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _setup(cfg, rng, with_object=True):
    g = cfg.base_grid
    grids = [4 * g, 2 * g, g]
    raws = [jnp.asarray(rng.randn(2, s, s, 3, 5 + cfg.num_class)
                        .astype(np.float32) * 0.3) for s in grids]
    preds = decode_all(raws, cfg)
    labels = [np.zeros((2, s, s, 3, 5 + cfg.num_class), np.float32)
              for s in grids]
    tb = np.zeros((2, 1, 1, 1, cfg.max_box_per_image, 5), np.float32)
    if with_object:
        labels[0][:, 5, 5, 0] = [0.29, 0.29, 0.1, 0.1, 1, 0, 1, 0]
        tb[:, 0, 0, 0, 0] = [0.29, 0.29, 0.1, 0.1, 1.0]
    return raws, preds, [jnp.asarray(l) for l in labels], jnp.asarray(tb)


def test_yolo_loss_finite_and_components(small_cfg, rng):
    cfg = small_cfg
    raws, preds, labels, tb = _setup(cfg, rng)
    out = yl.yolo_loss(preds, tb, labels, cfg)
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert float(out["conf_loss"]) == pytest.approx(
        float(out["object_loss"]) + float(out["noobject_loss"]), rel=1e-5)
    assert float(out["coord_loss"]) == pytest.approx(
        float(out["xy_loss"]) + float(out["wh_loss"]), rel=1e-5)
    assert float(out["class_loss"]) > 0


def test_ignore_mask_suppresses_noobj_near_gt(small_cfg, rng):
    """Cells predicting boxes with IoU>=0.5 vs GT are exempt from no-obj
    loss (yolo3_net_pos.py:657-680): growing a matching GT box must not
    increase (and normally decreases) the no-object loss."""
    cfg = small_cfg
    raws, preds, labels, tb = _setup(cfg, rng, with_object=False)
    base = float(yl.yolo_loss(preds, tb, labels, cfg)["noobject_loss"])
    # place one GT box exactly where scale-0 cell (5,5) anchor 0 predicts
    p = preds[0].norm_coord[0, 5, 5, 0]
    tb2 = tb.at[0, 0, 0, 0, 0].set(jnp.concatenate([p, jnp.asarray([0.0])]))
    withgt = float(yl.yolo_loss(preds, tb2, labels, cfg)["noobject_loss"])
    assert withgt < base


def test_wh_scale_weighting(small_cfg, rng):
    """(2 - w*h)^2: small boxes weigh coord errors more than large ones."""
    cfg = small_cfg
    raws, preds, labels, tb = _setup(cfg, rng, with_object=False)
    small = [np.asarray(l).copy() for l in labels]
    big = [np.asarray(l).copy() for l in labels]
    small[0][:, 5, 5, 0] = [0.29, 0.29, 0.01, 0.01, 1, 1, 0, 0]
    big[0][:, 5, 5, 0] = [0.29, 0.29, 0.9, 0.9, 1, 1, 0, 0]
    l_small = yl.yolo_loss(preds, tb, [jnp.asarray(x) for x in small], cfg)
    l_big = yl.yolo_loss(preds, tb, [jnp.asarray(x) for x in big], cfg)
    # xy targets identical; only the scale factor differs: (2-1e-4)^2 vs (2-.81)^2
    assert float(l_small["xy_loss"]) > float(l_big["xy_loss"])


def test_mask_loss_zero_without_positives(small_cfg, rng):
    cfg = small_cfg
    s = cfg.mask_size
    sm = jnp.asarray(rng.randn(2, s, s, 9).astype(np.float32))
    dets = jnp.zeros((2, cfg.max_detection, 6))
    tb = jnp.zeros((2, cfg.max_box_per_image, 5))
    tm = jnp.zeros((2, cfg.max_box_per_image, cfg.image_size, cfg.image_size), bool)
    out = ml.mask_loss(jax.random.PRNGKey(0), sm, dets, tb, tm, cfg)
    assert float(out) == 0.0


def test_mask_loss_positive_roi(small_cfg, rng):
    """A proposal exactly matching a GT box becomes a positive ROI with a
    nonzero, finite loss scaled by mask_scale."""
    cfg = small_cfg
    s, n = cfg.mask_size, cfg.image_size
    sm = jnp.asarray(rng.randn(2, s, s, 9).astype(np.float32))
    # GT: box (xc, yc, w, h) = (0.5, 0.5, 0.4, 0.4) -> yxyx (0.3,0.3,0.7,0.7)
    tb = jnp.zeros((2, cfg.max_box_per_image, 5)).at[:, 0].set(
        jnp.asarray([0.5, 0.5, 0.4, 0.4, 1.0]))
    tm = jnp.zeros((2, cfg.max_box_per_image, n, n), bool
                   ).at[:, 0, int(0.3 * n):int(0.7 * n), int(0.3 * n):int(0.7 * n)].set(True)
    dets = jnp.zeros((2, cfg.max_detection, 6)).at[:, 0, :4].set(
        jnp.asarray([0.3, 0.3, 0.7, 0.7])).at[:, 0, 5].set(0.9)
    out = float(ml.mask_loss(jax.random.PRNGKey(0), sm, dets, tb, tm, cfg))
    assert np.isfinite(out) and out > 0.0


def test_mask_loss_gradient_reaches_scoremaps(small_cfg, rng):
    cfg = small_cfg
    s, n = cfg.mask_size, cfg.image_size
    tb = jnp.zeros((2, cfg.max_box_per_image, 5)).at[:, 0].set(
        jnp.asarray([0.5, 0.5, 0.4, 0.4, 1.0]))
    tm = jnp.zeros((2, cfg.max_box_per_image, n, n), bool
                   ).at[:, 0, 14:34, 14:34].set(True)
    dets = jnp.zeros((2, cfg.max_detection, 6)).at[:, 0, :4].set(
        jnp.asarray([0.3, 0.3, 0.7, 0.7])).at[:, 0, 5].set(0.9)

    def f(sm):
        return ml.mask_loss(jax.random.PRNGKey(0), sm, dets, tb, tm, cfg)
    g = jax.grad(f)(jnp.asarray(rng.randn(2, s, s, 9).astype(np.float32)))
    assert float(jnp.abs(g).max()) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_resize_gt_masks_round():
    m = np.zeros((1, 8, 8), bool)
    m[0, 0:4, 0:4] = True
    out = np.asarray(ml.resize_gt_masks(jnp.asarray(m), 4))
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert out[0, 0, 0] == 1.0 and out[0, 3, 3] == 0.0


def _tf1_resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Literal numpy port of TF1 ResizeBilinear, align_corners=False.

    TF1 has no half_pixel_centers: the legacy mapping is src = dst*in/out,
    lo = floor(src), hi = min(lo+1, in-1), two nested lerps (the CPU
    kernel's ``top + (bottom - top) * y_lerp`` form) — the oracle for
    yolo3_net_pos.py:773 ``tf.image.resize_images`` on the GT masks.
    """
    in_h, in_w = img.shape
    h_scale, w_scale = in_h / out_h, in_w / out_w
    out = np.zeros((out_h, out_w), np.float32)
    for y in range(out_h):
        in_y = y * h_scale
        y0 = int(np.floor(in_y))
        y1 = min(y0 + 1, in_h - 1)
        yl = np.float32(in_y - y0)
        for x in range(out_w):
            in_x = x * w_scale
            x0 = int(np.floor(in_x))
            x1 = min(x0 + 1, in_w - 1)
            xl = np.float32(in_x - x0)
            top = img[y0, x0] + (img[y0, x1] - img[y0, x0]) * xl
            bot = img[y1, x0] + (img[y1, x1] - img[y1, x0]) * xl
            out[y, x] = top + (bot - top) * yl
    return out


def test_resize_gt_masks_tf1_oracle_576_to_288():
    """Reference shapes: 576 GT masks -> S=288 score maps.  The 2:1 ratio
    makes TF1's origin-aligned sampling an exact top-left subsample
    (frac = 0 everywhere) — half-pixel-center resize instead averages 4
    pixels and shifts every mask boundary.  Must match the oracle bit-for-
    bit; this is the case every reference training step hits."""
    rng = np.random.RandomState(42)
    m = (rng.rand(576, 576) > 0.6)
    want = np.round(_tf1_resize_bilinear_np(m.astype(np.float32), 288, 288))
    got = np.asarray(ml.resize_gt_masks(jnp.asarray(m[None]), 288))[0]
    np.testing.assert_array_equal(got, want)
    # and it IS the top-left subsample at 2:1
    np.testing.assert_array_equal(got, m[::2, ::2].astype(np.float32))


def test_resize_gt_masks_tf1_oracle_nondivisible():
    """Non-integer ratio (20 -> 7) exercises real interpolation weights."""
    rng = np.random.RandomState(7)
    m = rng.rand(20, 20).astype(np.float32)   # floats: check pre-round lerp
    want = _tf1_resize_bilinear_np(m, 7, 7)
    wh = np.asarray(ml._tf1_bilinear_matrix(20, 7))
    got = wh @ m @ wh.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # rounded {0,1} masks agree away from exact-0.5 knife edges
    mb = (rng.rand(3, 20, 20) > 0.5)
    want_r = np.stack([np.round(_tf1_resize_bilinear_np(
        x.astype(np.float32), 7, 7)) for x in mb])
    raw = np.stack([wh @ x.astype(np.float32) @ wh.T for x in mb])
    got_r = np.asarray(ml.resize_gt_masks(jnp.asarray(mb), 7))
    safe = np.abs(raw - 0.5) > 1e-4
    np.testing.assert_array_equal(got_r[safe], want_r[safe])
