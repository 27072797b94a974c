"""Native C++ data-path kernels: bit-exact parity with the Python oracles."""

import numpy as np
import pytest

from dis_yolo_tpu import native
from dis_yolo_tpu.data import augment, rasterize

pytestmark = [pytest.mark.quick, pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")]


def test_fill_polygon_matches_scanline(rng):
    for trial in range(20):
        k = rng.randint(3, 12)
        xs = rng.uniform(1, 58, k)
        ys = rng.uniform(1, 58, k)
        want = rasterize.fill_polygon_scanline(xs, ys, 60, 60)
        got = native.fill_polygon(xs, ys, 60, 60).astype(bool)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_fill_polygon_integer_square():
    xs = np.array([2, 8, 8, 2], float)
    ys = np.array([3, 3, 7, 7], float)
    got = native.fill_polygon(xs, ys, 12, 12).astype(bool)
    want = rasterize.fill_polygon_scanline(xs, ys, 12, 12)
    np.testing.assert_array_equal(got, want)
    assert got[3:8, 2:9].all()


def test_resize_bilinear_matches_numpy(rng):
    src = rng.rand(37, 23, 3).astype(np.float32)
    got = native.resize_bilinear_f32(src, 61, 41)
    # numpy fallback oracle (cv2-compatible half-pixel centers)
    import dis_yolo_tpu.data.augment as aug
    has_cv2 = aug.cv2 is not None
    try:
        aug.cv2 = None                      # force the numpy path
        want = aug.resize_bilinear(src, 61, 41)
    finally:
        if has_cv2:
            import cv2
            aug.cv2 = cv2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = rng.rand(50, 40, 3).astype(np.float32)
    got = native.resize_bilinear_f32(src, 100, 75)
    want = cv2.resize(src, (100, 75), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_letterbox_matches_python(rng):
    src = (rng.rand(64, 48, 3) * 255).astype(np.float32)
    # place 48x36 at (8, 30) in a 96x96 canvas with pad 127
    got = native.letterbox_f32(src, 96, 96, 48, 36, 8, 30, 127.0)
    want = augment.place_and_pad(src, 36, 48, 30, 8, 96, 96, 127.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_instance_mask_native_engine_matches_numpy(rng):
    outer = {"type": "out", "all_points_x": [2, 40, 40, 2],
             "all_points_y": [2, 2, 40, 40]}
    inner = {"type": "in", "all_points_x": [10, 25, 25, 10],
             "all_points_y": [10, 10, 25, 25]}
    a = rasterize.instance_mask([outer, inner], 48, 48, engine="native")
    b = rasterize.instance_mask([outer, inner], 48, 48, engine="numpy")
    np.testing.assert_array_equal(a, b)
