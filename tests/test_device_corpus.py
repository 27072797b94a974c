"""Device-resident corpus parity (data/device_corpus.py).

The corpus path must make the SAME decisions as the wire loader (shared
``sample_placement`` / ``boxes_to_net`` / first-wins anchor rule,
train_data.py:86-147,169-187 semantics) and assemble the same batch on
device — bit-exact for boxes/grids, <=1 LSB for resized image pixels and
knife-edge-only for rounded mask pixels (PARITY deviation #9).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig

quick = pytest.mark.quick   # all but the full-model block test below


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    from dis_yolo_tpu.data.synthetic import generate_dataset
    root = str(tmp_path_factory.mktemp("corpusdata"))
    generate_dataset(root, phases=("train",), images_per_phase=6,
                     image_size=160, seed=11)
    build_ground_truth_cache(root, "train")
    return root


def _cfg(root, **kw):
    return DISYoloConfig(dataset=root, image_size=96, test_size=96,
                         batch_size=2, pre_nms_top_k=64,
                         device_side_augs=True, **kw)


@pytest.fixture(scope="module")
def corpus_pair(synth_root):
    """(host corpus, device corpus, params loader, wire loader) at seed 7."""
    from dis_yolo_tpu.data.dataset import DefectTrainData
    from dis_yolo_tpu.data.device_corpus import (CorpusTrainData,
                                                 upload_corpus)
    cfg = _cfg(synth_root)
    params_data = CorpusTrainData(cfg, "train", seed=7)
    wire_data = DefectTrainData(cfg, "train", seed=7, host_augs=False)
    return cfg, params_data, upload_corpus(params_data.corpus), wire_data


@quick
def test_corpus_census_matches_wire_loader(corpus_pair):
    """Corpus boxes/classes equal the wire loader's per-example census."""
    cfg, params_data, _, wire_data = corpus_pair
    corpus = params_data.corpus
    assert corpus.n == len(params_data.gt_labels)
    assert corpus.images.dtype == np.uint8
    # at least one image has instances, none exceeds the padded slots
    assert corpus.nvalid.max() >= 1
    assert corpus.nvalid.max() <= cfg.max_box_per_image


@quick
def test_decisions_match_wire_loader(corpus_pair):
    """Same seed => same visit order, placements, and true boxes."""
    cfg, params_data, _, wire_data = corpus_pair
    for _ in range(3):   # several batches, crossing an epoch boundary
        p = params_data._make_batch()
        w = wire_data._make_batch()
        # params path ships host-normalized boxes: bit-equal to the wire
        np.testing.assert_array_equal(p["true_box"],
                                      w["true_boxes"][:, 0, 0, 0])


@quick
def test_assemble_matches_build_example(corpus_pair):
    """Device assembly reproduces the host-built batch field by field."""
    from dis_yolo_tpu.data.dataset import expand_batch
    from dis_yolo_tpu.data.device_corpus import make_assemble_fn
    cfg, params_data, dev_corpus, wire_data = corpus_pair
    assemble = jax.jit(make_assemble_fn(cfg))
    p = params_data._make_batch()
    w = expand_batch(wire_data._make_batch())
    got = jax.tree.map(np.asarray, assemble(dev_corpus, jax.tree.map(
        jnp.asarray, p)))

    # grids + boxes: bit-exact (identical integer/float math)
    np.testing.assert_array_equal(got["true_boxes"], w["true_boxes"])
    for k in ("labels_s8", "labels_s16", "labels_s32"):
        np.testing.assert_array_equal(got[k], w[k], err_msg=k)
    np.testing.assert_array_equal(got["windows"], w["windows"])

    # image: float bilinear + round-half-even vs cv2 fixed-point => <=1 LSB
    wire_u8 = (w["images"] * 255.0).round().astype(np.int16)
    diff = np.abs(got["images"].astype(np.int16) - wire_u8)
    assert diff.max() <= 1, f"image deviates by {diff.max()} LSB"
    assert diff.mean() < 0.2

    # masks: knife-edge (.5 bilinear ties) mismatches only
    mism = (got["true_masks"] != w["true_masks"]).mean()
    assert mism < 1e-3, f"mask mismatch fraction {mism}"


@quick
def test_grids_first_wins_occupancy():
    """Two boxes claiming one cell/anchor: device keeps the FIRST, like
    assign_anchors' occupied-cell skip (train_data.py:169-187)."""
    from dis_yolo_tpu.data.dataset import assign_anchors
    from dis_yolo_tpu.data.device_corpus import _grids_one
    cfg = DISYoloConfig(image_size=96, test_size=96)
    t = cfg.max_box_per_image
    # two near-identical boxes in the same cell + one distinct
    boxes = np.zeros((t, 5), np.float32)
    boxes[0] = [48.0, 48.0, 30.0, 30.0, 1]
    boxes[1] = [49.0, 47.0, 31.0, 29.0, 2]   # same cell, same best anchor
    boxes[2] = [10.0, 80.0, 8.0, 60.0, 0]
    host = assign_anchors(boxes[:3, :4], boxes[:3, 4].astype(np.int64), cfg)
    dev = _grids_one(jnp.asarray(boxes), jnp.asarray(boxes), jnp.asarray(3),
                     jnp.asarray(cfg.anchors_array()),
                     cfg.base_grid, cfg.anchors_per_scale, cfg.num_class,
                     float(cfg.image_size))
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(np.asarray(d), h)


@quick
def test_zero_box_image(corpus_pair):
    """An image with no valid boxes assembles empty grids, not NaNs."""
    from dis_yolo_tpu.data.device_corpus import _grids_one
    cfg = _cfg("/nonexistent-unused")
    t = cfg.max_box_per_image
    dev = _grids_one(jnp.zeros((t, 5)), jnp.zeros((t, 5)), jnp.asarray(0),
                     jnp.asarray(cfg.anchors_array()),
                     cfg.base_grid, cfg.anchors_per_scale, cfg.num_class,
                     float(cfg.image_size))
    for d in dev:
        assert np.asarray(d).sum() == 0.0
        assert np.isfinite(np.asarray(d)).all()


def test_corpus_multi_step_trains(synth_root):
    """K=2 corpus block: losses finite and close to the wire-path block
    (pixels differ by <=1 LSB, so trajectories agree loosely, not bitwise)."""
    from dis_yolo_tpu.data.dataset import DefectTrainData
    from dis_yolo_tpu.data.device_corpus import (CorpusTrainData,
                                                 upload_corpus)
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.train import train_step as ts
    cfg = _cfg(synth_root, steps_per_dispatch=2)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(variables["params"], cfg)
    state0 = ts.TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]), jnp.asarray(0))

    K = 2
    pd = CorpusTrainData(cfg, "train", seed=3)
    dev_corpus = upload_corpus(pd.corpus)
    pblocks = [pd._make_batch() for _ in range(K)]
    pblock = {k: np.stack([b[k] for b in pblocks]) for k in pblocks[0]}
    corpus_fn = ts.make_jitted_corpus_multi_step(model, tx, donate=False)
    st_c, _, m_c = corpus_fn(state0, dev_corpus, pblock,
                             jax.random.PRNGKey(9))

    wd = DefectTrainData(cfg, "train", seed=3, host_augs=False)
    wblocks = [wd._make_batch() for _ in range(K)]
    wblock = {k: np.stack([b[k] for b in wblocks]) for k in wblocks[0]}
    wire_fn = ts.make_jitted_multi_step(model, tx, donate=False)
    st_w, _, m_w = wire_fn(state0, wblock, jax.random.PRNGKey(9))

    lc = np.asarray(m_c["total_loss"])
    lw = np.asarray(m_w["total_loss"])
    assert np.isfinite(lc).all() and np.isfinite(lw).all()
    assert int(st_c.step) == K
    # same examples, same placements, same RNG: before any update the only
    # difference is <=1-LSB pixels, so the FIRST step's loss must agree
    # tightly.  Later steps amplify that through the optimizer (chaotic at
    # random init), so only finiteness is asserted for them.
    np.testing.assert_allclose(lc[0], lw[0], rtol=5e-3)
