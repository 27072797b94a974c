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


def test_change_light_lut_matches_float64_roundtrip(rng):
    """The LUT fast path must be bit-exact vs the reference's full-image
    float64 HLS round-trip (train_data.py:522-531): convert to HLS, scale L
    in float64, clamp at 255, C-truncate back to uint8, convert back."""
    cv2 = pytest.importorskip("cv2")
    for seed in range(6):
        img = (np.random.RandomState(seed).rand(37, 53, 3) * 255).astype(np.uint8)
        got = augment.change_light(img, np.random.RandomState(seed))
        # literal reference construction
        hls = cv2.cvtColor(img, cv2.COLOR_RGB2HLS).astype(np.float64)
        coeff = np.random.RandomState(seed).uniform() + 0.5
        hls[:, :, 1] = np.minimum(hls[:, :, 1] * coeff, 255)
        want = cv2.cvtColor(hls.astype(np.uint8), cv2.COLOR_HLS2RGB)
        np.testing.assert_array_equal(got, want)


def _place_and_pad_padchain(image, new_w, new_h, dx, dy, net_w, net_h,
                            pad_value):
    """Literal crop-then-pad chain the rewrite replaced (oracle)."""
    im = augment.resize_bilinear(image, new_w, new_h)
    if im.ndim == 2:
        im = im[:, :, None]
    if dx > 0:
        im = np.pad(im, ((0, 0), (dx, 0), (0, 0)), constant_values=pad_value)
    else:
        im = im[:, -dx:, :]
    if (new_w + dx) < net_w:
        im = np.pad(im, ((0, 0), (0, net_w - (new_w + dx)), (0, 0)),
                    constant_values=pad_value)
    if dy > 0:
        im = np.pad(im, ((dy, 0), (0, 0), (0, 0)), constant_values=pad_value)
    else:
        im = im[-dy:, :, :]
    if (new_h + dy) < net_h:
        im = np.pad(im, ((0, net_h - (new_h + dy)), (0, 0), (0, 0)),
                    constant_values=pad_value)
    return im[:net_h, :net_w, :]


def test_place_and_pad_matches_padchain_oracle(rng):
    """Single-canvas placement == the original np.pad chain, on every
    offset-sign combination incl. overhang past the right/bottom edge."""
    img = (rng.rand(40, 46, 3) * 255).astype(np.float32)
    cases = [(20, 22, 10, 9), (20, 22, 0, 0), (60, 58, -5, -7),
             (60, 58, 3, -4), (60, 58, -6, 2), (30, 30, 25, 25),
             (48, 48, 0, 0), (70, 64, -10, -9)]
    for new_w, new_h, dx, dy in cases:
        got = augment.place_and_pad(img, new_w, new_h, dx, dy, 48, 48, 127.0)
        want = _place_and_pad_padchain(img, new_w, new_h, dx, dy, 48, 48, 127.0)
        np.testing.assert_array_equal(got, want, err_msg=str((new_w, new_h, dx, dy)))
    # mask variant: 2-D float input, pad 0
    m = (rng.rand(40, 46) > 0.5).astype(np.float32)
    got = augment.place_and_pad(m, 60, 58, -5, 3, 48, 48, 0.0)
    want = _place_and_pad_padchain(m, 60, 58, -5, 3, 48, 48, 0.0)
    np.testing.assert_array_equal(got, want)


def test_motion_kernel_shapes():
    for lt in ("full", "left", "right"):
        k = augment._motion_kernel(3, 45.0, lt)
        assert k.shape == (3, 3)
        assert k.sum() == pytest.approx(1.0)


def test_resize_bilinear_identity(rng):
    img = rng.rand(17, 23, 3).astype(np.float32)
    out = augment.resize_bilinear(img, 23, 17)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)
