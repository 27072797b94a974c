"""Detection-filter + NMS behavior tests (vs a numpy greedy reference)."""

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.ops import nms
from tests.test_boxes_decode import np_iou_matrix
import pytest

pytestmark = pytest.mark.quick


def np_per_class_nms(boxes, scores, classids, thresh, iou_thresh, max_det):
    """Reference behavior: threshold, per-class greedy NMS, global top-k."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= thresh:
            continue
        ok = True
        for j in keep:
            if classids[j] == classids[i]:
                iou = np_iou_matrix(boxes[i:i + 1], boxes[j:j + 1])[0, 0]
                if iou > iou_thresh:
                    ok = False
                    break
        if ok:
            keep.append(i)
    keep = keep[:max_det]
    out = np.zeros((max_det, 6), np.float32)
    for r, i in enumerate(keep):
        out[r] = [*boxes[i], classids[i], scores[i]]
    return out


def _run_single(cfg, boxes_yxyx, scores, classids, window=None):
    """Drive filter_detections_single with synthetic flat candidates."""
    n = len(scores)
    c = cfg.num_class
    # build class_prob whose argmax/max match classids/1.0, conf = scores
    prob = np.full((n, c), 1e-6, np.float32)
    prob[np.arange(n), classids] = 1.0
    # convert yxyx -> cxcywh expected by the op
    y1, x1, y2, x2 = boxes_yxyx.T
    cxcywh = np.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=1)
    win = np.array([0., 0., 1., 1.], np.float32) if window is None else window
    det = nms.filter_detections_single(
        jnp.asarray(scores), jnp.asarray(prob), jnp.asarray(cxcywh),
        jnp.asarray(win), cfg, cfg.obj_threshold)
    return np.asarray(det)


def test_greedy_class_nms_matches_numpy(small_cfg, rng):
    cfg = small_cfg
    for trial in range(5):
        n = 40
        boxes = rng.uniform(0, 1, (n, 4)).astype(np.float32)
        boxes[:, 2:] = np.minimum(boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2]) * 0.5 + 0.05, 1.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        classids = rng.randint(0, cfg.num_class, n)
        got = _run_single(cfg, boxes, scores, classids)
        want = np_per_class_nms(boxes, scores, classids,
                                cfg.obj_threshold, cfg.iou_threshold,
                                cfg.max_detection)
        # compare the kept (classid, score) multisets and box values
        np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=1e-5, atol=1e-6,
                                   err_msg=f"trial {trial} scores")
        np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[:, 4], want[:, 4])


def test_threshold_is_strict(small_cfg):
    cfg = small_cfg
    boxes = np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]], np.float32)
    scores = np.array([cfg.obj_threshold, cfg.obj_threshold + 1e-3], np.float32)
    got = _run_single(cfg, boxes, scores, np.array([0, 1]))
    assert (got[:, 5] > 0).sum() == 1  # only the strictly-greater one


def test_window_clipping(small_cfg):
    cfg = small_cfg
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    scores = np.array([0.9], np.float32)
    window = np.array([0.1, 0.2, 0.8, 0.9], np.float32)
    got = _run_single(cfg, boxes, scores, np.array([0]), window)
    np.testing.assert_allclose(got[0, :4], window, rtol=1e-6)


def test_cross_class_no_suppression(small_cfg):
    """Identical boxes of different classes both survive (per-class NMS)."""
    cfg = small_cfg
    boxes = np.array([[0.2, 0.2, 0.7, 0.7], [0.2, 0.2, 0.7, 0.7]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    got = _run_single(cfg, boxes, scores, np.array([0, 1]))
    assert (got[:, 5] > 0).sum() == 2


def _adversarial_cluster(rng, n_cluster, n_spread, cluster_score=0.9,
                         spread_score=0.5):
    """n_cluster near-identical same-class boxes outscoring n_spread disjoint
    ones — the worst case for a top-K shortlist (keepers hide beyond rank K)."""
    cl = np.tile(np.array([[0.30, 0.30, 0.50, 0.50]], np.float32),
                 (n_cluster, 1))
    cl += rng.uniform(-0.005, 0.005, cl.shape).astype(np.float32)
    # disjoint small boxes on a grid, all same class as the cluster
    g = int(np.ceil(np.sqrt(n_spread)))
    ys, xs = np.divmod(np.arange(n_spread), g)
    sp = np.stack([0.02 + ys / g * 0.9, 0.02 + xs / g * 0.9,
                   0.02 + ys / g * 0.9 + 0.03, 0.02 + xs / g * 0.9 + 0.03],
                  axis=1).astype(np.float32)
    boxes = np.concatenate([cl, sp])
    scores = np.concatenate([
        cluster_score - np.arange(n_cluster, dtype=np.float32) * 1e-4,
        spread_score - np.arange(n_spread, dtype=np.float32) * 1e-4])
    classids = np.zeros(len(boxes), np.int64)
    return boxes, scores.astype(np.float32), classids


def test_shortlist_boundary_fallback_matches_oracle(rng):
    """>pre_nms_top_k above-threshold candidates whose top-K all collapse to
    one keeper: the shortlist underfills and the exact full-set fallback must
    reproduce unbounded greedy NMS (yolo3_net_pos.py:558-612 semantics)."""
    cfg = DISYoloConfig(image_size=96, test_size=96, pre_nms_top_k=16)
    boxes, scores, classids = _adversarial_cluster(rng, n_cluster=20,
                                                   n_spread=25)
    got = _run_single(cfg, boxes, scores, classids)
    want = np_per_class_nms(boxes, scores, classids, cfg.obj_threshold,
                            cfg.iou_threshold, cfg.max_detection)
    # unbounded greedy keeps 1 cluster box + all 25 spread boxes
    assert (want[:, 5] > 0).sum() == 26
    np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got[:, 4], want[:, 4])


def test_shortlist_boundary_at_default_512(rng):
    """The production default: >512 above-threshold candidates (550-cluster)
    still match the unbounded oracle via the runtime fallback."""
    cfg = DISYoloConfig(image_size=96, test_size=96)  # pre_nms_top_k=512
    assert cfg.pre_nms_top_k == 512
    boxes, scores, classids = _adversarial_cluster(rng, n_cluster=550,
                                                   n_spread=29)
    got = _run_single(cfg, boxes, scores, classids)
    want = np_per_class_nms(boxes, scores, classids, cfg.obj_threshold,
                            cfg.iou_threshold, cfg.max_detection)
    assert (want[:, 5] > 0).sum() == 30
    np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-5, atol=1e-6)


def test_shortlist_sufficient_no_fallback(small_cfg, rng):
    """Fewer valid candidates than K: result identical with/without the
    fallback wiring (prefix-stability sanity)."""
    cfg = small_cfg
    boxes, scores, classids = _adversarial_cluster(rng, n_cluster=5,
                                                   n_spread=10)
    got = _run_single(cfg, boxes, scores, classids)
    want = np_per_class_nms(boxes, scores, classids, cfg.obj_threshold,
                            cfg.iou_threshold, cfg.max_detection)
    np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=1e-5, atol=1e-6)


def test_batched_output_shape(small_cfg, rng):
    cfg = small_cfg
    from dis_yolo_tpu.ops.decode import decode_all
    g = cfg.base_grid
    raws = [jnp.asarray(rng.randn(2, s, s, 3, 5 + cfg.num_class).astype(np.float32))
            for s in (4 * g, 2 * g, g)]
    preds = decode_all(raws, cfg)
    wins = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (2, 1))
    dets = nms.filter_detections(preds, wins, cfg)
    assert dets.shape == (2, cfg.max_detection, 6)
    d = np.asarray(dets)
    valid = d[..., 5] > 0
    # scores sorted descending within each image
    for b in range(2):
        s = d[b, valid[b], 5]
        assert np.all(np.diff(s) <= 1e-6)


def test_fixpoint_engine_equals_scan_engine(small_cfg, rng):
    """The while-loop fixpoint NMS must reproduce the serial scan exactly,
    including long suppression chains (a ladder of staggered boxes where
    every other rung survives) and tied scores (argmax picks first index)."""
    cfg_fix = small_cfg.replace(nms_engine="fixpoint")
    cfg_scan = small_cfg.replace(nms_engine="scan")

    # ladder: 24 boxes each shifted to overlap its neighbor above IoU 0.3
    n = 24
    y = np.linspace(0.0, 0.46, n).astype(np.float32)
    ladder = np.stack([y, np.full(n, 0.1, np.float32),
                       y + 0.5, np.full(n, 0.6, np.float32)], axis=1)
    scores = np.linspace(0.9, 0.5, n).astype(np.float32)
    classids = np.zeros(n, np.int64)
    a = _run_single(cfg_fix, ladder, scores, classids)
    b = _run_single(cfg_scan, ladder, scores, classids)
    np.testing.assert_array_equal(a, b)
    assert (a[:, 5] > 0).sum() > 1          # chain really alternates

    # tied scores + random clusters, all classes
    for trial in range(4):
        m = 60
        centers = rng.uniform(0.2, 0.8, (6, 2))
        pick = rng.randint(0, 6, m)
        jitter = rng.uniform(-0.03, 0.03, (m, 2))
        lo = np.clip(centers[pick] + jitter - 0.1, 0, 1)
        hi = np.clip(lo + 0.2, 0, 1)
        boxes = np.concatenate([lo, hi], axis=1).astype(np.float32)
        scores = np.round(rng.uniform(0.3, 1.0, m) * 8) / 8  # force ties
        scores = scores.astype(np.float32)
        classids = rng.randint(0, small_cfg.num_class, m)
        a = _run_single(cfg_fix, boxes, scores, classids)
        b = _run_single(cfg_scan, boxes, scores, classids)
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")
