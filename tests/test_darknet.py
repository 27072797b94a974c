"""Darknet yolov3.weights bridge: binary parsing, per-anchor class crop,
selective restore — the reference README's custom-dataset step 2
("convert yolov3.weights to .ckpt ... manually crop the last class
prediction channel"), done natively.

The writer below synthesizes a .weights binary from the model's own layer
shape table (header + per-layer [bn beta,gamma,mean,var | bias] + OIHW
kernel — the darknet serialization), so the reader is checked against an
independent construction of the format, including pad/crop geometry.
"""

import io

import jax
import numpy as np
import pytest

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import checkpoint as ckpt


def _shapes(cfg):
    return jax.eval_shape(
        lambda: api.init_variables(cfg, jax.random.PRNGKey(0),
                                   image_size=64))


def _write_darknet(path, shapes, source_classes, rng):
    """Emit a synthetic darknet binary; returns {tf1_name: expected array}
    (post-crop, HWIO) for every conv1-75 tensor."""
    params = shapes["params"]
    out = io.BytesIO()
    out.write(np.asarray([0, 2, 0], np.int32).tobytes())     # major/minor/rev
    out.write(np.asarray([123], np.int64).tobytes())         # images seen
    expect = {}
    for lid in range(1, 76):
        layer = params[f"convolutional{lid}"]
        has_bn = "bn" in layer
        kh, kw, cin, cout = layer["conv"]["kernel"].shape
        names = ckpt.tf1_name_map(lid, has_bn)
        if has_bn:
            file_cout = cout
            for key in ("bn/bias", "bn/scale", "bn/mean", "bn/var"):
                arr = rng.randn(cout).astype(np.float32)
                out.write(arr.tobytes())
                expect[names[key]] = arr
        else:
            per_anchor = cout // 3
            file_cout = 3 * (5 + source_classes)
            bias = rng.randn(file_cout).astype(np.float32)
            out.write(bias.tobytes())
            expect[names["conv/bias"]] = (
                bias.reshape(3, 5 + source_classes)[:, :per_anchor]
                .reshape(-1))
        kernel = rng.randn(file_cout, cin, kh, kw).astype(np.float32)
        out.write(kernel.tobytes())
        if not has_bn:
            per_anchor = cout // 3
            kernel = (kernel.reshape(3, 5 + source_classes, cin, kh, kw)
                      [:, :per_anchor].reshape(3 * per_anchor, cin, kh, kw))
        expect[names["conv/kernel"]] = kernel.transpose(2, 3, 1, 0)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return expect


@pytest.mark.quick
def test_darknet_reader_coco_crop(tmp_path, rng):
    """80-class COCO file into the 3-class model: every BN/bias/kernel
    lands under its TF1 name, detection convs cropped per anchor."""
    cfg = DISYoloConfig()
    shapes = _shapes(cfg)
    path = str(tmp_path / "yolov3.weights")
    expect = _write_darknet(path, shapes, source_classes=80, rng=rng)
    values = ckpt.read_darknet_weights(path, shapes, source_classes=80)
    assert set(values) == set(expect)
    for name in expect:
        np.testing.assert_array_equal(values[name], expect[name], err_msg=name)
    # mask subnet has no darknet counterpart
    assert not any("convolutional76" in n or "convolutional82" in n
                   for n in values)


@pytest.mark.quick
def test_darknet_reader_exact_classes(tmp_path, rng):
    """source classes == model classes: no crop, exact consumption."""
    cfg = DISYoloConfig()
    shapes = _shapes(cfg)
    path = str(tmp_path / "native.weights")
    expect = _write_darknet(path, shapes, source_classes=3, rng=rng)
    values = ckpt.read_darknet_weights(path, shapes, source_classes=3)
    for name in expect:
        np.testing.assert_array_equal(values[name], expect[name], err_msg=name)


@pytest.mark.quick
def test_darknet_reader_rejects_wrong_source_classes(tmp_path, rng):
    cfg = DISYoloConfig()
    shapes = _shapes(cfg)
    path = str(tmp_path / "bad.weights")
    _write_darknet(path, shapes, source_classes=80, rng=rng)
    with pytest.raises(ValueError, match="truncated|unread"):
        ckpt.read_darknet_weights(path, shapes, source_classes=20)
    with pytest.raises(ValueError, match="cropping cannot invent"):
        ckpt.read_darknet_weights(path, _shapes(DISYoloConfig(classes=tuple(f"c{i}" for i in range(90)))),
                                  source_classes=80)


def test_darknet_restore_end_to_end(tmp_path, small_cfg, rng):
    """read_darknet_weights -> stage1_restore on real variables: restored
    layers match the file, the mask subnet keeps its init."""
    v = api.init_variables(small_cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "yolov3.weights")
    expect = _write_darknet(path, _shapes(small_cfg), source_classes=80,
                            rng=rng)
    values = ckpt.read_darknet_weights(path, v, source_classes=80)
    merged = ckpt.stage1_restore(v, values)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional1"]["conv"]["kernel"]),
        expect["yolo/convolutional1/weights"])
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional59"]["conv"]["bias"]),
        expect["yolo/convolutional59/biases"])
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["convolutional52"]["bn"]["var"]),
        expect["yolo/convolutional52/BatchNorm/moving_variance"])
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["convolutional78"]["conv"]["kernel"]),
        np.asarray(v["params"]["convolutional78"]["conv"]["kernel"]))


def test_cli_convert_darknet(tmp_path, rng, capsys):
    """cli convert-darknet writes the .npy dict train --tf1-weights eats."""
    from dis_yolo_tpu.cli import main
    cfg = DISYoloConfig()
    path = str(tmp_path / "yolov3.weights")
    expect = _write_darknet(path, _shapes(cfg), source_classes=80, rng=rng)
    out = str(tmp_path / "dn")
    main(["convert-darknet", "--weights", path, "--out", out,
          "--num-class", "3", "--source-classes", "80"])
    assert "saved" in capsys.readouterr().out
    loaded = np.load(out + ".npy", allow_pickle=True).item()
    assert set(loaded) == set(expect)
    np.testing.assert_array_equal(loaded["yolo/convolutional75/biases"],
                                  expect["yolo/convolutional75/biases"])
