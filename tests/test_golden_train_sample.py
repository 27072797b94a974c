"""Golden integration tests against the reference's shipped sample data.

``/root/reference/data/train_sample`` is the only real fixture the reference
provides (4 annotated concrete-defect images, per-class mask JPEGs, one
merge-box XML).  These tests run the full offline pipeline on a copy and
check structural invariants of the produced cache + loader batches.
Skipped when the reference checkout is not mounted.
"""

import os
import pickle
import shutil

import numpy as np
import pytest

SAMPLE = "/root/reference/data/train_sample"

pytestmark = [pytest.mark.quick, pytest.mark.skipif(not os.path.isdir(SAMPLE),
                                reason="reference sample data not mounted")]
cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def sample_root(tmp_path_factory):
    """Copy the sample split into a writable dataset layout (as 'train')."""
    root = tmp_path_factory.mktemp("refdata")
    dst = root / "train"
    for sub in ("images", "masks", "annotations"):
        shutil.copytree(os.path.join(SAMPLE, sub), dst / sub)
    return str(root)


@pytest.fixture(scope="module")
def cache(sample_root):
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    return build_ground_truth_cache(sample_root, "train")


def test_cache_covers_all_images(cache):
    assert len(cache) == 4
    names = sorted(a["filename"] for a in cache)
    assert names == ["00044.jpg", "001005.jpg", "00054.jpg", "01015.jpg"] or \
           names == sorted(["00044.jpg", "00054.jpg", "001005.jpg", "01015.jpg"])
    for a in cache:
        assert a["regions"], f"{a['filename']} produced no instances"
        h, w = a["size"]
        img = cv2.imread(os.path.join(SAMPLE, "images", a["filename"]))
        assert (h, w) == img.shape[:2]


def test_merge_boxes_group_00044(cache):
    """00044 has a merge XML: spall+rebar contours must merge to fewer
    instances than raw contours, classed by priority (rebar present)."""
    a = next(x for x in cache if x["filename"] == "00044.jpg")
    classes = [r["region_attributes"] for r in a["regions"].values()]
    # the XML's merge boxes each contain >=1 contour; with spall+rebar in
    # one group, priority says crack > spall(no rebar) > rebar
    assert set(classes) <= {"crack", "spall", "rebar"}
    # multi-polygon instances exist after merging
    poly_counts = [len(r["shape_attributes"]) for r in a["regions"].values()]
    assert max(poly_counts) >= 2


def test_rasterized_masks_match_source_masks(cache, sample_root):
    """Union of rasterized instances ~ the binary class-mask JPEG."""
    from dis_yolo_tpu.data import rasterize
    a = next(x for x in cache if x["filename"] == "001005.jpg")
    h, w = a["size"]
    union = {"crack": np.zeros((h, w), bool), "spall": np.zeros((h, w), bool)}
    for r in a["regions"].values():
        cls = r["region_attributes"]
        m = rasterize.instance_mask(r["shape_attributes"], h, w)
        if cls in union:
            union[cls] |= m
    for cls, got in union.items():
        src = cv2.imread(os.path.join(SAMPLE, "masks", f"001005{cls}.jpg"),
                         cv2.IMREAD_GRAYSCALE)
        want = src > 127
        if not want.any():
            continue
        inter = (got & want).sum()
        iou = inter / (got | want).sum()
        assert iou > 0.93, f"{cls}: rasterized/source IoU {iou:.3f}"


def test_loader_batch_on_real_data(cache, sample_root):
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.data.dataset import DefectTrainData
    cfg = DISYoloConfig(dataset=sample_root, image_size=192, batch_size=2)
    data = DefectTrainData(cfg, "train", seed=0)
    from dis_yolo_tpu.data.dataset import expand_batch
    batch = expand_batch(data.get())
    assert batch["images"].shape == (2, 192, 192, 3)
    assert np.isfinite(batch["images"]).all()
    nb = int(np.sum(np.any(batch["true_boxes"][..., :4] != 0, axis=-1)))
    assert nb >= 1
    obj = (batch["labels_s8"][..., 4].sum() + batch["labels_s16"][..., 4].sum()
           + batch["labels_s32"][..., 4].sum())
    assert obj >= 1
    # masks and boxes index-aligned: box row nonzero <=> mask nonzero
    for b in range(2):
        boxes_nz = np.any(batch["true_boxes"][b, 0, 0, 0, :, :4] != 0, axis=-1)
        masks_nz = batch["true_masks"][b].any(axis=(1, 2))
        np.testing.assert_array_equal(boxes_nz, masks_nz)


def test_evaluator_groundtruth_on_real_data(cache, sample_root):
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.eval.map_eval import Evaluator
    cfg = DISYoloConfig(dataset=sample_root, test_size=192)
    ev = Evaluator(cfg, "train", with_semantic=True)
    assert len(ev.index) == 4
    for stem in ev.index:
        assert ev.gt_masks[stem], stem
        sem = ev.gt_semantic[stem]
        assert sem.max() <= 3 and sem.any()
