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
