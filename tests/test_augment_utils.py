"""Host augmentation primitives: placement math, photometric dispatch."""

import numpy as np
import pytest

from dis_yolo_tpu.data import augment

pytestmark = pytest.mark.quick


def test_identity_placement_tall_and_wide():
    # tall image: height fills, width centered
    new_w, new_h, dx, dy = augment.identity_placement(50, 100, 96, 96)
    assert (new_h, dy) == (96, 0)
    assert new_w == 48 and dx == (96 - 48) // 2
    # wide image
    new_w, new_h, dx, dy = augment.identity_placement(100, 50, 96, 96)
    assert (new_w, dx) == (96, 0)
    assert new_h == 48 and dy == (96 - 48) // 2


def test_place_and_pad_value_and_crop(rng):
    img = (rng.rand(40, 40, 3) * 255).astype(np.float32)
    # shrink + place at (10, 10): border is pad 127
    out = augment.place_and_pad(img, 20, 20, 10, 10, 48, 48, 127.0)
    assert out.shape == (48, 48, 3)
    assert (out[0, :, :] == 127).all() and (out[:, 0, :] == 127).all()
    assert (out[31:, :, :] == 127).all()
    # negative offsets crop the resized image
    out2 = augment.place_and_pad(img, 60, 60, -5, -7, 48, 48, 127.0)
    assert out2.shape == (48, 48, 3)


def test_sample_scale_crop_identity_branch():
    rng = np.random.RandomState(1)
    seen = set()
    for _ in range(20):
        sc, new_w, new_h, dx, dy = augment.sample_scale_crop(rng, 80, 60, 96, 96)
        seen.add(sc)
        if sc == 1:  # centered letterbox
            assert (dx, dy) == ((96 - new_w) // 2, (96 - new_h) // 2)
        assert new_w > 0 and new_h > 0
    assert seen == {1, 2}   # both branches exercised


def test_photometric_dispatch_order(rng):
    """Code-order dispatch (train_data.py:393-401): 2=noise, 3=light, 4=blur."""
    img = (rng.rand(32, 32, 3) * 200 + 20).astype(np.uint8)
    r = np.random.RandomState(0)
    noised = augment.apply_photometric(img.copy(), 2, np.random.RandomState(0))
    assert ((noised == 1) | (noised == 0)).any()       # salt writes value 1
    lit = augment.apply_photometric(img.copy(), 3, np.random.RandomState(1))
    assert lit.shape == img.shape and not np.array_equal(lit, img)
    blurred = augment.apply_photometric(img.copy(), 4, np.random.RandomState(2))
    # blur reduces local variance
    assert blurred.astype(int).std() <= img.astype(int).std() + 1
    same = augment.apply_photometric(img.copy(), 1, r)
    np.testing.assert_array_equal(same, img)


def test_motion_kernel_shapes():
    for lt in ("full", "left", "right"):
        k = augment._motion_kernel(3, 45.0, lt)
        assert k.shape == (3, 3)
        assert k.sum() == pytest.approx(1.0)


def test_resize_bilinear_identity(rng):
    img = rng.rand(17, 23, 3).astype(np.float32)
    out = augment.resize_bilinear(img, 23, 17)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)
