"""Model structure tests: decoder stride variants, layer naming, k variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api


@pytest.mark.parametrize("stride,last_layer", [(4, 79), (2, 82), (1, 85)])
def test_mask_decoder_strides(stride, last_layer):
    """The reference's published (s=2) and commented (s=4 / s=1) decoder
    variants (yolo3_net_pos.py:361-461) are config-selectable."""
    cfg = DISYoloConfig(image_size=96, mask_stride=stride)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    raws = api.forward(model, v, jnp.zeros((1, 96, 96, 3)))
    assert raws[3].shape == (1, 96 // stride, 96 // stride, 9)
    names = sorted(int(n[len("convolutional"):]) for n in v["params"])
    assert max(names) == last_layer


def test_k5_scoremaps():
    cfg = DISYoloConfig(image_size=96, k_map=5)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    raws = api.forward(model, v, jnp.zeros((1, 96, 96, 3)))
    assert raws[3].shape[-1] == 25


def test_layer_names_match_tf1_scopes(small_cfg):
    """convolutional1..82 with conv/bn split, matching the TF1 include lists
    (train_yolo3_mask.py:87-101)."""
    from dis_yolo_tpu.train.checkpoint import (STAGE1_CONV_BIAS,
                                               STAGE1_CONV_BN, tf1_name_map)
    v = api.init_variables(small_cfg, jax.random.PRNGKey(0))
    params = v["params"]
    for i in STAGE1_CONV_BN:
        assert f"convolutional{i}" in params
        assert "bn" in params[f"convolutional{i}"]
    for i in STAGE1_CONV_BIAS:
        layer = params[f"convolutional{i}"]
        assert "bn" not in layer and "bias" in layer["conv"]
    m = tf1_name_map(7, True)
    assert m["conv/kernel"] == "yolo/convolutional7/weights"
    assert m["bn/var"] == "yolo/convolutional7/BatchNorm/moving_variance"


def test_tf1_weight_bridge_roundtrip(small_cfg):
    """Synthesize a TF1-style value dict and check selective restore."""
    from dis_yolo_tpu.train import checkpoint as ckpt
    v = api.init_variables(small_cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    values = {}
    k58 = np.asarray(v["params"]["convolutional58"]["conv"]["kernel"])
    values["yolo/convolutional58/weights"] = rng.randn(*k58.shape).astype(np.float32)
    values["yolo/convolutional58/BatchNorm/gamma"] = np.full(k58.shape[-1], 2.0, np.float32)
    values["yolo/convolutional59/weights"] = np.asarray(
        rng.randn(*np.asarray(v["params"]["convolutional59"]["conv"]["kernel"]).shape),
        np.float32)
    merged = ckpt.load_tf1_weights(v, values, ignore_missing=True)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional58"]["conv"]["kernel"]),
        values["yolo/convolutional58/weights"])
    assert float(np.asarray(merged["params"]["convolutional58"]["bn"]["scale"])[0]) == 2.0
    # untouched layers keep their init
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional60"]["conv"]["kernel"]),
        np.asarray(v["params"]["convolutional60"]["conv"]["kernel"]))
    # stage-1 selective restore skips the mask subnet even if values exist
    values["yolo/convolutional82/weights"] = np.zeros_like(
        np.asarray(v["params"]["convolutional82"]["conv"]["kernel"]))
    staged = ckpt.stage1_restore(v, values)
    assert not np.array_equal(
        np.asarray(staged["params"]["convolutional82"]["conv"]["kernel"]),
        values["yolo/convolutional82/weights"])


def test_export_tf1_weights_roundtrip(small_cfg):
    """export_tf1_weights is the exact inverse of load_tf1_weights: dumping
    trained-style variables and restoring into a fresh init reproduces every
    conv/BN leaf (incl. moving statistics)."""
    from dis_yolo_tpu.train import checkpoint as ckpt
    src = api.init_variables(small_cfg, jax.random.PRNGKey(7))
    # make values distinguishable from a fresh init
    src = jax.tree.map(lambda x: x + 0.25, src)
    dump = ckpt.export_tf1_weights(src)
    assert "yolo/convolutional1/weights" in dump
    assert "yolo/convolutional59/biases" in dump
    assert "yolo/convolutional52/BatchNorm/moving_variance" in dump

    dst = api.init_variables(small_cfg, jax.random.PRNGKey(8))
    merged = ckpt.load_tf1_weights(dst, dump, ignore_missing=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        merged, jax.tree.map(np.asarray, src))


def test_piecewise_lr_schedule_matches_reference(small_cfg):
    from dis_yolo_tpu.train import train_step as ts
    sched = ts.piecewise_lr_schedule(small_cfg)
    for step in (1, 9999, 10000, 10001, 20000, 20001, 25000, 25001, 40000):
        assert float(sched(jnp.asarray(step))) == pytest.approx(
            float(ts.reference_lr_schedule(jnp.asarray(step)))), step
    scaled = small_cfg.replace(lr_boundaries=(10, 20), lr_values=(1e-2, 1e-3, 1e-4))
    s2 = ts.piecewise_lr_schedule(scaled)
    assert float(s2(jnp.asarray(10))) == pytest.approx(1e-2)
    assert float(s2(jnp.asarray(11))) == pytest.approx(1e-3)
    assert float(s2(jnp.asarray(21))) == pytest.approx(1e-4)


@pytest.mark.quick
@pytest.mark.parametrize("stride", [2, 1])
def test_decoder_commute_matches_concat_form(stride):
    """cfg.decoder_commute runs the decoder's 1x1 fusion convs before the
    2x nearest upsample (layers.CommutedConcatConvBN) — exact algebra and
    an identical parameter tree, so the SAME variables drive both graphs
    and the outputs agree to accumulation-order ULPs."""
    cfg = DISYoloConfig(image_size=96, mask_stride=stride)
    cfg_c = cfg.replace(decoder_commute=True)
    model = api.create_model(cfg)
    model_c = api.create_model(cfg_c)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    v_c = api.init_variables(cfg_c, jax.random.PRNGKey(0))
    # identical parameter trees (paths AND initial values)
    jax.tree.map(np.testing.assert_array_equal, v["params"], v_c["params"])

    x = jnp.asarray(np.random.RandomState(3).rand(1, 96, 96, 3), jnp.float32)
    base = api.forward(model, v, x)
    comm = api.forward(model_c, v, x)       # same variables, commuted graph
    for b, c in zip(base, comm):
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=2e-2, atol=6e-3)
    # scoremaps (f32 head) agree tightly
    np.testing.assert_allclose(np.asarray(base[3]), np.asarray(comm[3]),
                               rtol=2e-2, atol=6e-3)
