"""AOT serving-artifact export (dis_yolo_tpu/export.py).

The reference deploys by restoring a TF1 checkpoint into a rebuilt graph
(calculate_test_map.py:182-185); here the serving graph + weights serialize
to one StableHLO artifact.  These tests prove the round trip: exported
bytes -> deserialized callable -> outputs identical to the live predict.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dis_yolo_tpu import export as exp
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables


@pytest.fixture(scope="module")
def deploy_setup(small_cfg):
    cfg = small_cfg.replace(batch_size=1)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    # non-trivial BN statistics so folding actually moves numbers
    img = jnp.asarray(np.random.RandomState(3)
                      .rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    _, stats = api.forward(model, v, img, train=True)
    v = {"params": v["params"], "batch_stats": stats}
    dcfg = cfg.replace(deploy=True)
    return dcfg, deploy_variables(v)


def test_export_roundtrip_matches_live_predict(deploy_setup, rng, tmp_path):
    dcfg, dv = deploy_setup
    exported = exp.export_predict(dcfg, dv, batch_size=1, obj_thresh=0.0)
    blob = exp.save_artifact(exported, str(tmp_path / "m"), dcfg,
                             obj_thresh=0.0)
    assert (tmp_path / "m.stablehlo").exists()

    run, meta = exp.load_artifact(str(tmp_path / "m"))
    img = jnp.asarray(rng.rand(1, dcfg.test_size, dcfg.test_size, 3)
                      .astype(np.float32))
    win = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)

    dmodel = api.create_model(dcfg)
    dets_live, masks_live = api.predict(dmodel, dv, img, win, obj_thresh=0.0)
    dets_art, masks_art = run(img, win)

    # same math, same constants — but the artifact is an independently
    # compiled program, so fusion-order rounding differs at the last ulp
    # (measured <=1.2e-7 abs).  Keep set, classes and row order must be
    # identical; values allclose at fp-noise tolerance.
    np.testing.assert_array_equal(np.asarray(dets_live[..., 4]),
                                  np.asarray(dets_art[..., 4]))
    np.testing.assert_allclose(np.asarray(dets_live), np.asarray(dets_art),
                               rtol=1e-5, atol=1e-6)
    # masks are sigmoid probabilities computed through bf16 convs — two
    # independent compilations drift up to ~1e-4 (measured 1.2e-4 max)
    np.testing.assert_allclose(np.asarray(masks_live),
                               np.asarray(masks_art), atol=5e-4)
    assert meta["config"]["test_size"] == dcfg.test_size
    assert meta["in_shapes"][0] == [1, dcfg.test_size, dcfg.test_size, 3]


def test_export_shape_enforced(deploy_setup, tmp_path):
    dcfg, dv = deploy_setup
    exported = exp.export_predict(dcfg, dv, batch_size=1)
    exp.save_artifact(exported, str(tmp_path / "m"), dcfg)
    run, _ = exp.load_artifact(str(tmp_path / "m"))
    wrong = jnp.zeros((2, dcfg.test_size, dcfg.test_size, 3), jnp.float32)
    with pytest.raises(Exception):
        run(wrong, jnp.zeros((2, 4), jnp.float32))


def test_export_pallas_requires_tpu_platform(deploy_setup):
    dcfg, dv = deploy_setup
    with pytest.raises(ValueError, match="pallas"):
        exp.export_predict(dcfg, dv, pallas=True, platforms=("cpu",))


def test_export_symbolic_batch_serves_multiple_sizes(deploy_setup, rng,
                                                     tmp_path):
    """One shape-polymorphic artifact (batch_size="b") serves b=1 AND b=3,
    matching the per-shape live predict — the analog of the reference
    graph's [None,...] image placeholder (yolo3_net_pos.py:44)."""
    dcfg, dv = deploy_setup
    exported = exp.export_predict(dcfg, dv, batch_size="b", obj_thresh=0.0)
    exp.save_artifact(exported, str(tmp_path / "poly"), dcfg, obj_thresh=0.0)
    run, meta = exp.load_artifact(str(tmp_path / "poly"))
    assert meta["in_shapes"][0][0] == "b"

    model = api.create_model(dcfg)
    for b in (1, 3):
        img = jnp.asarray(rng.rand(b, dcfg.test_size, dcfg.test_size, 3)
                          .astype(np.float32))
        win = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32),
                       (b, 1))
        want_d, want_m = api.predict(model, dv, img, win, obj_thresh=0.0)
        got_d, got_m = run(img, win)
        # independently compiled programs (symbolic vs static shapes):
        # same tolerance story as test_export_roundtrip_matches_live_predict
        np.testing.assert_array_equal(np.asarray(want_d[..., 4]),
                                      np.asarray(got_d[..., 4]))
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                                   rtol=1e-4, atol=1e-5, err_msg=f"b={b}")
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   atol=5e-4)


def test_export_symbolic_batch_rejects_pallas(deploy_setup):
    dcfg, dv = deploy_setup
    with pytest.raises(ValueError, match="symbolic"):
        exp.export_predict(dcfg, dv, batch_size="b", pallas=True)
