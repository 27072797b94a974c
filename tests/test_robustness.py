"""Stress & edge-case tests: clustered NMS, loader limits, eval edges."""

import numpy as np
import jax.numpy as jnp
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.ops import nms
from tests.test_nms import _run_single, np_per_class_nms


def test_nms_dense_cluster(small_cfg, rng):
    """50 heavily-overlapping boxes around 3 centers: survivors match the
    numpy greedy oracle exactly."""
    cfg = small_cfg
    centers = np.array([[0.3, 0.3], [0.7, 0.7], [0.3, 0.7]])
    boxes, classids = [], []
    for i in range(51):
        c = centers[i % 3] + rng.normal(0, 0.01, 2)
        s = 0.08 + rng.uniform(0, 0.02)
        boxes.append([c[0] - s, c[1] - s, c[0] + s, c[1] + s])
        classids.append(i % 3)
    boxes = np.asarray(boxes, np.float32)
    classids = np.asarray(classids)
    scores = rng.uniform(0.3, 1.0, len(boxes)).astype(np.float32)
    got = _run_single(cfg, boxes, scores, classids)
    want = np_per_class_nms(boxes, scores, classids, cfg.obj_threshold,
                            cfg.iou_threshold, cfg.max_detection)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nms_more_survivors_than_slots(small_cfg, rng):
    """60 well-separated boxes: exactly max_detection kept, highest scores."""
    cfg = small_cfg
    n = 60
    xs = (np.arange(n) % 8) / 8.0
    ys = (np.arange(n) // 8) / 8.0
    boxes = np.stack([ys, xs, ys + 0.05, xs + 0.05], 1).astype(np.float32)
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    classids = np.zeros(n, np.int64)
    got = _run_single(cfg, boxes, scores, classids)
    kept = got[got[:, 5] > 0]
    assert len(kept) == cfg.max_detection
    np.testing.assert_allclose(np.sort(kept[:, 5])[::-1],
                               np.sort(scores)[::-1][:cfg.max_detection],
                               rtol=1e-6)


def test_nms_all_below_threshold(small_cfg):
    cfg = small_cfg
    boxes = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    got = _run_single(cfg, boxes, np.array([0.1], np.float32), np.array([0]))
    assert (got == 0).all()


def test_loader_instance_overflow(tmp_path, rng):
    """More than max_box_per_image instances: truncated with a warning,
    masks/boxes stay index-aligned (train_data.py:74-78)."""
    cv2 = pytest.importorskip("cv2")
    from dis_yolo_tpu.data.dataset import DefectTrainData
    root = tmp_path / "d"
    img_dir = root / "train" / "images"
    img_dir.mkdir(parents=True)
    img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "a.jpg"), img)

    # 25 tiny square instances
    polys, names = [], []
    for i in range(25):
        x, y = 5 + (i % 5) * 24, 5 + (i // 5) * 24
        polys.append([{"type": "out",
                       "all_points_x": [x, x + 8, x + 8, x],
                       "all_points_y": [y, y, y + 8, y + 8]}])
        names.append("crack")
    labels = [{"imname": str(img_dir / "a.jpg"), "class_names": names,
               "polygons": polys}]
    cfg = DISYoloConfig(dataset=str(root), image_size=96, batch_size=1)
    data = DefectTrainData(cfg, "train", seed=0, labels=labels)
    from dis_yolo_tpu.data.dataset import expand_batch
    batch = expand_batch(data.get())
    t = cfg.max_box_per_image
    boxes_nz = np.any(batch["true_boxes"][0, 0, 0, 0, :, :4] != 0, axis=-1)
    masks_nz = batch["true_masks"][0].any(axis=(1, 2))
    assert boxes_nz.sum() <= t
    np.testing.assert_array_equal(boxes_nz, masks_nz)


def test_evaluator_skips_empty_region_images():
    """Annotations with empty regions are dropped like the reference's
    'Skip unannotated images' filter (validation_map.py:42)."""
    from dis_yolo_tpu.eval.map_eval import Evaluator
    cfg = DISYoloConfig(test_size=96)
    anns = [{"filename": "a.jpg", "size": [96, 96], "regions": {
        "0": {"region_attributes": "spall", "shape_attributes": [
            {"type": "out", "all_points_x": [10, 40, 40, 10],
             "all_points_y": [10, 10, 40, 40]}]}}}]
    ev = Evaluator(cfg, "test", with_semantic=True,
                   annotations=anns, index=["a"])
    assert ev.index == ["a"] and len(ev.gt_masks["a"]) == 1


def test_decode_non_square_resolution(small_cfg, rng):
    """Fully-convolutional: grids follow the input (yolo3_net_pos.py:44)."""
    import jax
    from dis_yolo_tpu.models import api
    cfg = small_cfg
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    out = api.forward(model, v, jnp.zeros((1, 64, 128, 3)))
    assert out[0].shape[1:3] == (8, 16)     # stride 8
    assert out[2].shape[1:3] == (2, 4)      # stride 32
    assert out[3].shape[1:3] == (32, 64)    # stride 2 score maps


@pytest.mark.quick
def test_best_checkpoint_tracking_and_prune_protection(tmp_path):
    """best.json round-trip + prune keeps the protected best step alive
    (the automated analog of the reference's keep-all + manual val_map
    peak selection, train_yolo3_mask.py:58,221-227)."""
    import os
    from dis_yolo_tpu.train import checkpoint as ckpt

    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    for s in (500, 1000, 1500, 2000, 2500):
        os.makedirs(os.path.join(d, f"step_{s:08d}"))
    assert ckpt.read_best(d) is None and ckpt.best_checkpoint(d) is None
    ckpt.mark_best(d, 1000, 0.796)
    assert ckpt.read_best(d) == {"step": 1000, "mAP": 0.796}
    assert ckpt.best_checkpoint(d).endswith("step_00001000")

    ckpt.prune_checkpoints(d, keep=2, protect=(1000,))
    left = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert left == ["step_00001000", "step_00002000", "step_00002500"]
    # best dir deleted out-of-band -> best_checkpoint degrades to None
    ckpt.prune_checkpoints(d, keep=1)
    assert ckpt.best_checkpoint(d) is None


@pytest.mark.quick
def test_prune_protects_current_step_against_stale_dirs(tmp_path):
    """A reused output_dir can hold STALE higher-numbered checkpoints;
    pruning right after saving step 500 must not age out the step just
    written (its async Orbax write may still be in flight — observed as a
    FileNotFoundError inside the tmp dir mid-run).  The Solver therefore
    always passes the current step in ``protect`` (solver._at_save)."""
    import os
    from dis_yolo_tpu.train import checkpoint as ckpt

    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    for s in (500, 1000, 1500, 2000):      # 500 = new save, rest = stale
        os.makedirs(os.path.join(d, f"step_{s:08d}"))
    ckpt.prune_checkpoints(d, keep=3, protect=(500,))
    left = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert "step_00000500" in left


@pytest.mark.quick
def test_background_save_snapshots_before_mutation(tmp_path):
    """save_checkpoint_background clones the state ON DEVICE before the
    background thread's device->host copy, so a train loop that donates
    (overwrites) the live buffers right after the call cannot corrupt the
    checkpoint.  Restored values must equal the state AT save time."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dis_yolo_tpu.train import checkpoint as ckpt
    from dis_yolo_tpu.train.train_step import TrainState

    d = str(tmp_path / "ckpt")
    params = {"w": jnp.arange(8, dtype=jnp.float32)}
    state = TrainState(params, {"bn": jnp.ones(3)}, {"m": jnp.zeros(8)},
                       jnp.asarray(7))
    ckpt.save_checkpoint_background(d, state, 500)
    # simulate the donated in-place update: rebind to NEW different values
    state = TrainState({"w": jnp.full(8, -1.0)}, {"bn": jnp.zeros(3)},
                       {"m": jnp.ones(8)}, jnp.asarray(8))
    ckpt.wait_for_checkpoints()
    template = TrainState({"w": jnp.zeros(8)}, {"bn": jnp.zeros(3)},
                          {"m": jnp.zeros(8)}, jnp.asarray(0))
    restored = ckpt.restore_checkpoint(
        ckpt.latest_checkpoint(d), template)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(8, dtype=np.float32))
    assert int(restored.step) == 7
