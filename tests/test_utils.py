"""Utility coverage: Timer, MetricLogger, runtime helpers, visualize."""

import json
import os

import numpy as np
import jax.numpy as jnp

from dis_yolo_tpu.utils.metrics_log import MetricLogger
from dis_yolo_tpu.utils.runtime import device_prefetch
from dis_yolo_tpu.utils.timer import Timer
from dis_yolo_tpu.utils.visualize import blend_mask, draw_instances
import pytest

pytestmark = pytest.mark.quick


def test_timer_average_and_remain():
    # deterministic fake clock: each call advances 1s
    ticks = iter(range(1000))
    t = Timer(clock=lambda: float(next(ticks)))
    t.tic()                      # clock 1
    assert t.toc(average=False) == 1.0   # clock 2
    with t.span():               # clock 3 .. 4
        pass
    assert t.calls == 2 and t.average_time == 1.0 and t.total_time == 2.0
    # remain extrapolates from *construction* (clock 0): at clock 5 with
    # 5/10 iters done, lifetime 5s -> 5s remain (reference init_time rule)
    assert t.remain(5, 10) == "0:00:05"
    assert t.remain(0, 10) == "0:00:00"


def test_timer_toc_requires_tic():
    t = Timer()
    try:
        t.toc()
    except RuntimeError:
        return
    raise AssertionError("toc() without tic() must raise")


def test_metric_logger_jsonl_and_history(tmp_path):
    lg = MetricLogger(str(tmp_path), "t")
    lg.log(10, {"total_loss": 1.5})
    lg.log_validation(20, 2, 1.2, {"AP": [0.1, 0.2, 0.3], "recall": 0.4,
                                   "precision": 0.5, "mAP": 0.2})
    lg.close()
    lines = [json.loads(x) for x in open(lg.path)]
    assert lines[0]["step"] == 10 and lines[0]["kind"] == "train"
    assert lines[1]["kind"] == "val" and lines[1]["mAP"] == 0.2
    lg.save_val_history(str(tmp_path / "lossnp"), 20)
    arr = np.load(tmp_path / "lossnp" / "20map.npy")
    assert arr.shape == (1, 9)
    np.testing.assert_allclose(arr[0], [20, 2, 1.2, 0.1, 0.2, 0.3, 0.4, 0.5, 0.2])


def test_device_prefetch_order_and_exhaustion():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_device_prefetch_short_stream():
    out = list(device_prefetch(iter([{"x": np.ones(3)}]), size=4))
    assert len(out) == 1


def test_blend_and_draw(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:20, 8:20] = True
    before = img[10, 10].copy()
    blend_mask(img, mask, "crack")
    assert not np.array_equal(img[10, 10], before)
    out = draw_instances(img, [{"classname": "spall", "mask": mask,
                                "box": (8, 8, 20, 20), "score": 0.8}])
    assert out.shape == img.shape and out.dtype == np.uint8
