"""Data pipeline: rasterization parity, anchor assignment, full synthetic
preprocess -> loader -> batch integration."""

import os

import numpy as np
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data import rasterize
from dis_yolo_tpu.data.dataset import DefectTrainData, assign_anchors, load_labels
from dis_yolo_tpu.data.val_data import DefectValData, letterbox_image

pytestmark = pytest.mark.quick

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# rasterization
# ---------------------------------------------------------------------------

def test_scanline_square():
    xs = np.array([2, 8, 8, 2])
    ys = np.array([3, 3, 7, 7])
    m = rasterize.fill_polygon_scanline(xs, ys, 12, 12)
    assert m[3:8, 2:9].all()
    assert m.sum() == 5 * 7


def test_cv2_vs_scanline_agree(rng):
    """The two fill engines agree except on a thin boundary band."""
    for _ in range(10):
        k = rng.randint(3, 9)
        xs = rng.randint(5, 55, k)
        ys = rng.randint(5, 55, k)
        # close a convex-ish shape by angular sort to avoid self-intersection
        ang = np.arctan2(ys - ys.mean(), xs - xs.mean())
        order = np.argsort(ang)
        xs, ys = xs[order], ys[order]
        a = rasterize._fill(xs, ys, 60, 60, engine="numpy")
        b = rasterize._fill(xs, ys, 60, 60, engine="auto")
        disagree = a ^ b
        if disagree.any():
            # disagreement only near the polygon boundary
            edge = cv2.dilate(
                cv2.polylines(np.zeros((60, 60), np.uint8),
                              [np.stack([xs, ys], 1).astype(np.int32)],
                              True, 1).astype(np.uint8),
                np.ones((3, 3), np.uint8))
            assert not (disagree & ~edge.astype(bool)).any()


def test_hole_subtraction_keeps_rim():
    outer = {"type": "out", "all_points_x": [1, 18, 18, 1], "all_points_y": [1, 1, 18, 18]}
    inner = {"type": "in", "all_points_x": [5, 12, 12, 5], "all_points_y": [5, 5, 12, 12]}
    m = rasterize.instance_mask([outer, inner], 20, 20)
    assert m[2, 2] and not m[8, 8]
    assert m[5, 5]  # hole rim stays on (reference sets vertices True)
    bb = rasterize.mask_to_box(m)
    assert bb == (1, 1, 19, 19)


# ---------------------------------------------------------------------------
# anchor assignment
# ---------------------------------------------------------------------------

def test_assign_anchors_best_scale():
    cfg = DISYoloConfig()  # 576px, anchors from the reference
    net = cfg.image_size
    # a small 30x24 box should land on anchor 0 -> stride-8 grid (labels_s8)
    boxes = np.array([[100., 100., 30., 24.]], np.float32)
    grids = assign_anchors(boxes, np.array([0]), cfg)
    s8, s16, s32 = grids
    assert s8[..., 4].sum() == 1 and s16[..., 4].sum() == 0 and s32[..., 4].sum() == 0
    yx = np.argwhere(s8[..., 4] == 1)[0]
    m = s8.shape[0]
    assert yx[0] == int(100 * m / net) and yx[1] == int(100 * m / net)
    assert s8[yx[0], yx[1], yx[2], 5] == 1.0  # class 0 one-hot
    # a huge 470x450 box -> anchor 8 -> stride-32 grid
    grids = assign_anchors(np.array([[288., 288., 470., 450.]], np.float32),
                           np.array([2]), cfg)
    assert grids[2][..., 4].sum() == 1 and grids[0][..., 4].sum() == 0


def test_assign_anchors_occupied_skip():
    cfg = DISYoloConfig()
    boxes = np.array([[100., 100., 30., 24.], [101., 101., 31., 25.]], np.float32)
    grids = assign_anchors(boxes, np.array([0, 1]), cfg)
    assert grids[0][..., 4].sum() == 1      # second box skipped (same cell+anchor)
    cell = grids[0][grids[0][..., 4] == 1]
    assert cell[0, 5] == 1.0                # first box's class won


# ---------------------------------------------------------------------------
# synthetic end-to-end: generate -> preprocess -> load -> batch
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    from dis_yolo_tpu.data.synthetic import generate_dataset
    root = str(tmp_path_factory.mktemp("synthdata"))
    generate_dataset(root, phases=("train", "val"), images_per_phase=6,
                     image_size=160, seed=0)
    for phase in ("train", "val"):
        annos = build_ground_truth_cache(root, phase)
        assert len(annos) == 6
        assert all(a["regions"] for a in annos)
    return root


def test_cache_schema(synth_root):
    import pickle
    with open(os.path.join(synth_root, "train/cache/ground_truth_cache.pkl"), "rb") as f:
        annos = pickle.load(f)
    a = annos[0]
    assert set(a) == {"filename", "regions", "size"}
    r0 = a["regions"]["0"]
    assert r0["region_attributes"] in ("crack", "spall", "rebar")
    p0 = r0["shape_attributes"][0]
    assert p0["type"] == "out"
    assert len(p0["all_points_x"]) == len(p0["all_points_y"]) > 2


def test_train_loader_batch(synth_root):
    cfg = DISYoloConfig(dataset=synth_root, image_size=96, batch_size=2,
                        pre_nms_top_k=64)
    data = DefectTrainData(cfg, "train", seed=0)
    compact = data.get()
    s, t, g = cfg.image_size, cfg.max_box_per_image, cfg.base_grid
    # compact wire format: uint8 images + bit-packed masks
    assert compact["images"].dtype == np.uint8
    assert compact["masks_packed"].shape == (2, t, s * s // 8)
    from dis_yolo_tpu.data.dataset import expand_batch
    batch = expand_batch(compact)
    assert batch["images"].shape == (2, s, s, 3)
    assert batch["images"].dtype == np.float32
    assert 0.0 <= batch["images"].min() and batch["images"].max() <= 1.0
    assert batch["true_masks"].shape == (2, t, s, s)
    assert batch["true_boxes"].shape == (2, 1, 1, 1, t, 5)
    assert batch["labels_s8"].shape == (2, 4 * g, 4 * g, 3, 5 + cfg.num_class)
    # normalized coords
    assert batch["true_boxes"][..., :4].max() <= 1.0
    # at least one image has an object assigned somewhere
    total_obj = (batch["labels_s8"][..., 4].sum()
                 + batch["labels_s16"][..., 4].sum()
                 + batch["labels_s32"][..., 4].sum())
    assert total_obj >= 1
    # epoch advance
    for _ in range(5):
        data.get()
    assert data.epoch >= 2


def test_prefetch_thread(synth_root):
    cfg = DISYoloConfig(dataset=synth_root, image_size=96, batch_size=2)
    data = DefectTrainData(cfg, "train", seed=1)
    data.start_prefetch()
    b1 = data.next_prefetched()
    b2 = data.next_prefetched()
    data.stop()
    assert b1["images"].shape == b2["images"].shape


def test_prefetch_restart_after_stop(synth_root):
    """stop() then start_prefetch() must serve batches again: Solver.train
    stops the thread on exit, and a second train()/resume on the same
    Solver used to deadlock on an immediately-exiting worker (the stop
    event stayed set — found by scripts/bench_augment.py hanging)."""
    cfg = DISYoloConfig(dataset=synth_root, image_size=96, batch_size=2)
    data = DefectTrainData(cfg, "train", seed=1)
    data.start_prefetch()
    data.next_prefetched()
    data.stop()
    data.start_prefetch()
    b = data.next_prefetched()     # hangs forever without the _stop.clear()
    data.stop()
    assert b["images"].shape[0] == 2


def test_val_loader_and_window(synth_root):
    cfg = DISYoloConfig(dataset=synth_root, test_size=96)
    val = DefectValData(cfg, "val")
    images, names, windows = val.get()
    assert images.shape[1:] == (96, 96, 3)
    assert len(names) == images.shape[0]
    # window reflects letterboxing of the taller-than-wide synthetic images
    for w in windows:
        assert 0.0 <= w[0] <= w[2] <= 1.0 and 0.0 <= w[1] <= w[3] <= 1.0


def test_letterbox_window_math(rng):
    img = (rng.rand(100, 50, 3) * 255).astype(np.float32)  # tall image
    canvas, window = letterbox_image(img, 96)
    # width letterboxed: new_w = 50*96//100 = 48, left = (96-48)//2 = 24
    np.testing.assert_allclose(window, [0, 24 / 96, 1.0, 72 / 96])
    assert (canvas[:, :24] == 127 / 255.).all()
    assert (canvas[:, 72:] == 127 / 255.).all()


def test_parallel_loader_worker_count_invariance(synth_root):
    """ParallelTrainData batches are bit-identical for any pool width:
    inline (workers=0), 1-worker pool, and 3-worker pool must agree.
    This is the determinism contract that lets a run be reproduced on a
    host with a different core count."""
    from dis_yolo_tpu.data.dataset import ParallelTrainData
    cfg = DISYoloConfig(dataset=synth_root, image_size=96, batch_size=2)

    def take(workers, n=4):
        data = ParallelTrainData(cfg, "train", seed=3, workers=workers)
        if workers == 0:
            out = [data.get() for _ in range(n)]
        else:
            data.start_prefetch()
            out = [data.next_prefetched() for _ in range(n)]
        data.stop()
        return out

    ref = take(0)
    for w in (1, 3):
        got = take(w)
        for b_ref, b_got in zip(ref, got):
            for key in b_ref:
                np.testing.assert_array_equal(b_got[key], b_ref[key],
                                              err_msg=f"workers={w} {key}")


def test_parallel_loader_restart(synth_root):
    """Pool loader survives stop() -> start_prefetch() like the thread one,
    and keeps advancing the deterministic example counter."""
    from dis_yolo_tpu.data.dataset import ParallelTrainData
    cfg = DISYoloConfig(dataset=synth_root, image_size=96, batch_size=2)
    data = ParallelTrainData(cfg, "train", seed=3, workers=2)
    data.start_prefetch()
    b1 = data.next_prefetched()
    data.stop()
    data.start_prefetch()
    b2 = data.next_prefetched()
    data.stop()
    assert b1["images"].shape == b2["images"].shape


def test_prepare_batch_matches_expand_batch(synth_root):
    """Device-side compact-batch expansion (train_step.prepare_batch) is
    bit-exact with the host reference (expand_batch): uint8/255 images and
    big-endian bit-unpacked masks."""
    import jax.numpy as jnp
    from dis_yolo_tpu.data.dataset import expand_batch
    from dis_yolo_tpu.train.train_step import prepare_batch
    cfg = DISYoloConfig(dataset=synth_root, image_size=96, batch_size=2)
    compact = DefectTrainData(cfg, "train", seed=0).get()
    host = expand_batch(compact)
    dev = prepare_batch({k: jnp.asarray(v) for k, v in compact.items()})
    np.testing.assert_array_equal(np.asarray(dev["images"]), host["images"])
    np.testing.assert_array_equal(np.asarray(dev["true_masks"]),
                                  host["true_masks"])
    assert "masks_packed" not in dev
