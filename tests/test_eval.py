"""Evaluation parity tests: AP math, mask IoU, un-letterboxing, end-to-end
perfect-detection mAP/mIoU on synthetic annotations."""

import numpy as np
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.eval.postprocess import correct_yolo_box, paste_mask
from dis_yolo_tpu.eval.voc_eval import compute_overlaps_masks, voc_ap, voc_eval

pytestmark = pytest.mark.quick


def test_voc_ap_known_values():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 2 / 3])
    ap = voc_ap(rec, prec, use_07_metric=False)
    # envelope: 1.0 on [0, .5], 2/3 on (.5, 1] -> 0.5 + 2/3*0.5
    assert ap == pytest.approx(0.5 + 2 / 3 * 0.5)
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    assert ap07 == pytest.approx((6 * 1.0 + 5 * 2 / 3) / 11)


def test_compute_overlaps_masks():
    a = np.zeros((10, 10, 1), bool)
    a[2:6, 2:6, 0] = True          # 16 px
    b = np.zeros((10, 10, 2), bool)
    b[4:8, 4:8, 0] = True          # overlap 2x2=4, union 28
    b[0:2, 0:2, 1] = True          # no overlap
    ov = compute_overlaps_masks(a, b)
    assert ov[0, 0] == pytest.approx(4 / 28)
    assert ov[0, 1] == 0.0


def test_voc_eval_greedy_matching():
    gt = {"img0": [{"classid": 0, "difficult": 0,
                    "mask": np.pad(np.ones((4, 4), bool), ((0, 6), (0, 6)))}]}
    # two detections on the same GT: best first -> TP, duplicate -> FP
    m = np.pad(np.ones((4, 4), bool), ((0, 6), (0, 6)))
    dets = [{"imageid": "img0", "score": 0.9, "mask": m},
            {"imageid": "img0", "score": 0.8, "mask": m}]
    recall, precision, ap = voc_eval(dets, gt, ["img0"], 0)
    assert recall == 1.0 and precision == 0.5 and ap == 1.0


def test_voc_eval_packed_masks_score_identically(rng):
    """The popcount route ('mask_packed' dets, bit-packed GT) must reproduce
    the float-dot route exactly — random masks, odd width (pad bits live),
    multiple GT objects per image, near-threshold IoUs included."""
    h, w = 37, 53                       # w not a multiple of 8
    gt = {}
    dets_bool, dets_packed = [], []
    for img in ("a", "b", "c"):
        objs = []
        for g in range(3):
            m = rng.rand(h, w) > 0.55
            objs.append({"classid": 0, "difficult": 0, "mask": m})
        gt[img] = objs
        for d in range(4):
            # perturb a GT mask so IoUs land all over [0, 1]
            m = gt[img][d % 3]["mask"] ^ (rng.rand(h, w) > 0.8 + 0.05 * d)
            score = float(rng.rand())
            dets_bool.append({"imageid": img, "score": score, "mask": m})
            dets_packed.append({"imageid": img, "score": score,
                                "mask_packed": np.packbits(m, axis=-1)})
    want = voc_eval(dets_bool, gt, ["a", "b", "c"], 0)
    got = voc_eval(dets_packed, gt, ["a", "b", "c"], 0)
    assert got == want


def test_mask_iou_single_exact_vs_popcount(rng):
    """The on-device IoU matrix (ops/paste.mask_iou_single — the
    device-score sweep route) must equal the host popcount scorer
    bit-for-bit: exact 0/1 products, f32 accumulation, counts < 2^24."""
    import jax.numpy as jnp
    from dis_yolo_tpu.eval.voc_eval import packed_overlaps
    from dis_yolo_tpu.ops.paste import mask_iou_single

    h, w, d, g = 29, 45, 6, 5           # w not a multiple of 8: pad bits live
    det = rng.rand(d, h, w) > 0.5
    det[3] = False                      # empty detection mask -> IoU 0 row
    gt = rng.rand(g, h, w) > 0.6
    gt[:, 0, 0] = True                  # zero-area GTs never occur (filtered
    #                                     at rasterization, map_eval.py)
    gt_packed = np.packbits(gt, axis=-1)
    gt_areas = gt.sum(axis=(1, 2))
    got = np.asarray(mask_iou_single(jnp.asarray(det), jnp.asarray(gt_packed),
                                     jnp.asarray(gt_areas.astype(np.float32))))
    assert got.dtype == np.float32
    for k in range(d):
        want = packed_overlaps(np.packbits(det[k], axis=-1), gt_packed,
                               gt_areas.astype(np.int64))
        np.testing.assert_array_equal(got[k], want)


def test_evaluate_detections_iou_route_matches_packed(rng):
    """'iou' entries (device-scored sweep) must reproduce the packed-mask
    route exactly — multi-class GT exercises the per-class column slice."""
    import jax.numpy as jnp
    from dis_yolo_tpu.ops.paste import mask_iou_single

    cfg = DISYoloConfig()
    ev = Evaluator(cfg, "test", annotations=[], index=[])
    h, w = 33, 41
    ev.index = ["a", "b"]
    ev.gt_sizes = {s: (h, w) for s in ev.index}
    ev.gt_masks = {}
    for s in ev.index:
        labels = []
        for g in range(4):
            m = rng.rand(h, w) > 0.5
            m[0, 0] = True
            labels.append({"imageid": s, "classid": g % 3, "difficult": 0,
                           "mask": m})
        ev.gt_masks[s] = labels

    d_count = 6
    det_packed, det_iou = [], []
    for i, s in enumerate(ev.index):
        boxes = np.zeros((d_count, 6), np.float32)
        full = np.zeros((d_count, h, w), bool)
        valid = np.zeros((d_count,), bool)
        for k in range(5):
            full[k] = (ev.gt_masks[s][k % 4]["mask"]
                       ^ (rng.rand(h, w) > 0.85))
            boxes[k, 4] = (k + i) % 3
            boxes[k, 5] = float(rng.rand())
            valid[k] = True
        gtm = np.stack([o["mask"] for o in ev.gt_masks[s]])
        iou = np.asarray(mask_iou_single(
            jnp.asarray(full), jnp.asarray(np.packbits(gtm, axis=-1)),
            jnp.asarray(gtm.sum(axis=(1, 2)).astype(np.float32))))
        det_packed.append({"imname": s, "boxes": boxes, "valid": valid,
                           "full_masks_packed": np.packbits(full, axis=-1)})
        det_iou.append({"imname": s, "boxes": boxes, "valid": valid,
                        "iou": iou})
    want = ev.evaluate_detections(det_packed)
    got = ev.evaluate_detections(det_iou)
    assert got["AP"] == want["AP"] and got["mAP"] == want["mAP"]
    assert got["recall"] == want["recall"]
    assert got["precision"] == want["precision"]


def test_semantic_confusion_exact_vs_bincount(rng):
    """The on-device confusion totals (ops/paste.semantic_confusion) must
    equal the host bincount pass integer-for-integer."""
    import jax.numpy as jnp
    from dis_yolo_tpu.ops.paste import semantic_confusion

    n = 4
    t = rng.randint(0, n, (41, 37)).astype(np.uint8)
    p = rng.randint(0, n, (41, 37)).astype(np.uint8)
    got = np.asarray(semantic_confusion(jnp.asarray(p), jnp.asarray(t), n))
    joint = t.astype(np.int64).ravel() * n + p.astype(np.int64).ravel()
    want = np.bincount(joint, minlength=n * n).reshape(n, n)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


def test_miou_from_confusions_matches_miou(rng):
    """Summing device confusion totals == scoring fetched semantic maps."""
    import jax.numpy as jnp
    from dis_yolo_tpu.ops.paste import semantic_confusion

    cfg = DISYoloConfig()
    ev = Evaluator(cfg, "test", with_semantic=True, annotations=[], index=[])
    n = cfg.num_class + 1
    ev.index = ["a", "b", "c"]
    ev.gt_semantic = {s: rng.randint(0, n, (29, 31)).astype(np.uint8)
                      for s in ev.index}
    pred = {s: rng.randint(0, n, (29, 31)).astype(np.uint8)
            for s in ev.index}
    confs = {s: np.asarray(semantic_confusion(
        jnp.asarray(pred[s]), jnp.asarray(ev.gt_semantic[s]), n))
        for s in ev.index}
    want = ev.miou(pred)
    got = ev.miou_from_confusions(confs)
    assert got == want


def test_correct_yolo_box_identity():
    # image exactly net-sized: inverse letterbox is just scaling
    x1, y1, x2, y2 = correct_yolo_box(0.25, 0.25, 0.75, 0.75, 96, 96, 96, 96)
    assert (x1, y1, x2, y2) == (24, 24, 72, 72)


def test_correct_yolo_box_tall_image():
    # 192x96 tall image letterboxed into 96: width band [24, 72)
    ih, iw, net = 192, 96, 96
    # a box spanning the whole image: normalized window coords
    x1, y1, x2, y2 = correct_yolo_box(24 / 96, 0.0, 72 / 96, 1.0, ih, iw, net, net)
    assert (x1, y1) == (0, 0) and (x2, y2) == (iw, ih)


def test_paste_mask_roundtrip():
    size = 48
    pred = np.zeros((size, size), np.float32)
    pred[12:24, 12:24] = 1.0
    box_norm = np.array([12 / size, 12 / size, 24 / size, 24 / size])
    full = paste_mask(pred, box_norm, (24, 24, 48, 48), 96, 96)
    assert full[24:48, 24:48].all() and full.sum() == 24 * 24


# ---------------------------------------------------------------------------
# end-to-end: perfect detections on synthetic annotations => mAP 1, mIoU ~1
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synthetic_eval():
    """Annotations whose images are exactly test_size (no letterboxing)."""
    cfg = DISYoloConfig(test_size=96)
    sz = 96
    anns = []
    rects = [((10, 10, 40, 34), "crack"), ((50, 50, 90, 80), "spall"),
             ((20, 60, 44, 90), "rebar")]
    for i in range(3):
        regions = {}
        for j, ((x1, y1, x2, y2), cls) in enumerate(rects[: i + 1]):
            regions[str(j)] = {
                "region_attributes": cls,
                "shape_attributes": [{
                    "type": "out",
                    "all_points_x": [x1, x2, x2, x1],
                    "all_points_y": [y1, y1, y2, y2],
                }],
            }
        anns.append({"filename": f"im{i}.jpg", "regions": regions,
                     "size": [sz, sz]})
    index = [f"im{i}" for i in range(3)]
    ev = Evaluator(cfg, "test", with_semantic=True,
                   annotations=anns, index=index)
    return cfg, ev, anns, index, rects


def test_perfect_detections_full_marks(synthetic_eval):
    cfg, ev, anns, index, rects = synthetic_eval
    sz, s = 96, 96 // 2   # image size, score-map size
    detdata = []
    for i, stem in enumerate(index):
        n = i + 1
        boxes = np.zeros((cfg.max_detection, 6), np.float32)
        masks = np.zeros((cfg.max_detection, s, s), np.float32)
        for j, ((x1, y1, x2, y2), cls) in enumerate(rects[:n]):
            # GT masks include the boundary pixel -> box extent +1
            gm = ev.gt_masks[stem][j]["mask"]
            ys, xs = np.where(gm)
            by1, by2 = ys.min(), ys.max() + 1
            bx1, bx2 = xs.min(), xs.max() + 1
            boxes[j] = [by1 / sz, bx1 / sz, by2 / sz, bx2 / sz,
                        cfg.class_to_ind()[cls], 0.9 - 0.05 * j]
            # downsample GT to the score-map grid as the "sigmoid mask"
            masks[j] = gm.reshape(s, 2, s, 2).mean(axis=(1, 3))
        detdata.append({"imname": stem, "boxes": boxes, "masks": masks})

    res = ev.evaluate_detections(detdata, collect_semantic=True)
    assert res["AP"] == [1.0, 1.0, 1.0]
    assert res["mAP"] == 1.0
    m = ev.miou(res["semantic_maps"])
    assert m["miou"] > 0.9
    assert all(v > 0.8 for v in m["iou"])


def test_empty_detections(synthetic_eval):
    cfg, ev, anns, index, rects = synthetic_eval
    s = 48
    detdata = [{"imname": stem,
                "boxes": np.zeros((cfg.max_detection, 6), np.float32),
                "masks": np.zeros((cfg.max_detection, s, s), np.float32)}
               for stem in index]
    res = ev.evaluate_detections(detdata, collect_semantic=True)
    assert res["mAP"] == 0.0
    m = ev.miou(res["semantic_maps"])
    # background IoU is high, defect classes 0
    assert m["iou"][0] > 0.5 and m["iou"][1] == 0.0


def test_miou_bincount_matches_loop_oracle(rng):
    """Vectorized confusion pass == the reference's per-class loop totals
    (calculate_test_map.py:304-345) on random semantic maps."""
    cfg = DISYoloConfig()
    ev = Evaluator(cfg, "test", with_semantic=True, annotations=[], index=[])
    n = cfg.num_class + 1
    ev.index = ["a", "b"]
    ev.gt_semantic = {s: rng.randint(0, n, (37, 23)).astype(np.uint8)
                      for s in ev.index}
    pred = {s: rng.randint(0, n, (37, 23)).astype(np.uint8) for s in ev.index}

    got = ev.miou(pred)

    conf = np.zeros((n, n), np.int64)
    for s in ev.index:
        t, p = ev.gt_semantic[s], pred[s]
        for ti in range(n):
            for pi in range(n):
                conf[ti, pi] += int(np.sum((t == ti) & (p == pi)))
    want = []
    for c in range(n):
        inter = conf[c, c]
        union = conf[:, c].sum() + conf[c, :].sum() - inter
        want.append(inter / union if union > 0 else 0.0)
    np.testing.assert_allclose(got["iou"], want)
    assert got["miou"] == pytest.approx(float(np.mean(want)))


def test_evaluator_rasterized_cache_roundtrip(tmp_path, rng):
    """Second Evaluator construction loads the rasterized-GT disk cache."""
    import os
    import pickle
    cv2 = pytest.importorskip("cv2")
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    from dis_yolo_tpu.data.synthetic import generate_dataset

    root = str(tmp_path)
    generate_dataset(root, phases=("val",), images_per_phase=3,
                     image_size=128, seed=9)
    build_ground_truth_cache(root, "val")
    cfg = DISYoloConfig(dataset=root, test_size=96)

    ev1 = Evaluator(cfg, "val", with_semantic=True)
    cache = os.path.join(root, "val", "cache", "gt_rasterized_val.pkl")
    assert os.path.isfile(cache)

    ev2 = Evaluator(cfg, "val", with_semantic=True)
    assert ev2.index == ev1.index
    for stem in ev1.index:
        assert len(ev2.gt_masks[stem]) == len(ev1.gt_masks[stem])
        np.testing.assert_array_equal(ev2.gt_semantic[stem],
                                      ev1.gt_semantic[stem])

    # a corrupt cache (e.g. truncated by a crash mid-write) is rebuilt
    with open(cache, "wb") as f:
        f.write(b"garbage")
    ev3 = Evaluator(cfg, "val", with_semantic=True)
    assert ev3.index == ev1.index
    for stem in ev1.index:
        np.testing.assert_array_equal(ev3.gt_semantic[stem],
                                      ev1.gt_semantic[stem])


def test_evaluate_detections_reports_post_time(synthetic_eval):
    """t_post_s (the host crop/assemble stage the reference times
    separately, calculate_test_map.py:301-302) is present and sane."""
    cfg, ev, anns, index, rects = synthetic_eval
    s = 96 // 2
    detdata = [{"imname": stem,
                "boxes": np.zeros((cfg.max_detection, 6), np.float32),
                "masks": np.zeros((cfg.max_detection, s, s), np.float32)}
               for stem in index]
    res = ev.evaluate_detections(detdata)
    assert res["t_post_s"] >= 0.0
