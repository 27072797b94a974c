"""Device-side augmentation parity vs the host path's semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data import device_augment as da
from dis_yolo_tpu.data.dataset import _flip_grid as host_flip_grid


def _batch(cfg, rng, b=4):
    s, t, g, c = cfg.image_size, cfg.max_box_per_image, cfg.base_grid, cfg.num_class
    labels_s8 = np.zeros((b, 4 * g, 4 * g, 3, 5 + c), np.float32)
    labels_s8[:, 3, 5, 1] = [0.29, 0.40, 0.1, 0.2, 1, 0, 0, 1]
    tb = np.zeros((b, 1, 1, 1, t, 5), np.float32)
    tb[:, 0, 0, 0, 0] = [0.29, 0.40, 0.1, 0.2, 2.0]
    return dict(
        images=jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32)),
        true_masks=jnp.asarray(rng.rand(b, t, s, s) > 0.8),
        true_boxes=jnp.asarray(tb),
        labels_s8=jnp.asarray(labels_s8),
        labels_s16=jnp.zeros((b, 2 * g, 2 * g, 3, 5 + c)),
        labels_s32=jnp.zeros((b, g, g, 3, 5 + c)),
        windows=jnp.tile(jnp.asarray([0., 0., 1., 1.]), (b, 1)),
    )


def test_flip_grid_matches_host(rng):
    """Device grid flip == host _flip_grid applied to normalized grids."""
    cfg = DISYoloConfig(image_size=96)
    net = cfg.image_size
    g = np.zeros((12, 12, 3, 8), np.float32)
    g[3, 5, 1] = [0.29, 0.40, 0.1, 0.2, 1, 0, 0, 1]
    # host flip operates in pixels then the loader divides by net; emulate:
    g_px = g.copy()
    g_px[..., :4] *= net
    want = host_flip_grid(g_px, 1, net)
    want[..., :4] /= net
    got = np.asarray(da._flip_grid(jnp.asarray(g), 1, float(net)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    want_v = host_flip_grid(g_px, 0, net)
    want_v[..., :4] /= net
    got_v = np.asarray(da._flip_grid(jnp.asarray(g), 0, float(net)))
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-7)


def test_augment_batch_shapes_and_determinism(rng):
    cfg = DISYoloConfig(image_size=96)
    batch = _batch(cfg, rng)
    fn = jax.jit(lambda k, b: da.augment_batch(k, b, cfg.image_size))
    out1 = fn(jax.random.PRNGKey(0), batch)
    out2 = fn(jax.random.PRNGKey(0), batch)
    for k in batch:
        assert out1[k].shape == batch[k].shape, k
        np.testing.assert_array_equal(np.asarray(out1[k]), np.asarray(out2[k]))
    out3 = fn(jax.random.PRNGKey(1), batch)
    assert any(not np.array_equal(np.asarray(out1[k]), np.asarray(out3[k]))
               for k in ("images",))


def test_flip_preserves_object_count(rng):
    cfg = DISYoloConfig(image_size=96)
    batch = _batch(cfg, rng)
    out = jax.jit(lambda k, b: da.augment_batch(k, b, cfg.image_size,
                                                photometric=False))(
        jax.random.PRNGKey(3), batch)
    np.testing.assert_array_equal(
        np.asarray(out["labels_s8"][..., 4]).sum(axis=(1, 2, 3)),
        np.asarray(batch["labels_s8"][..., 4]).sum(axis=(1, 2, 3)))
    # class one-hots untouched
    assert np.asarray(out["labels_s8"][..., 5:]).sum() == \
        np.asarray(batch["labels_s8"][..., 5:]).sum()
    # box validity count preserved
    v0 = np.any(np.asarray(batch["true_boxes"])[..., :4] != 0, -1).sum()
    v1 = np.any(np.asarray(out["true_boxes"])[..., :4] != 0, -1).sum()
    assert v0 == v1


def test_hls_round_trip_matches_cv2(rng):
    """The jnp uint8-HLS emulation vs cv2: HLS2RGB bit-exact; RGB2HLS has
    L,S bit-exact and H off only on exact-.5 SIMD rounding ties."""
    cv2 = __import__("pytest").importorskip("cv2")
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    h8, l8, s8 = (np.asarray(v) for v in da._rgb2hls_u8(jnp.asarray(
        img.astype(np.float32))))
    hls_cv = cv2.cvtColor(img, cv2.COLOR_RGB2HLS).astype(np.int64)
    np.testing.assert_array_equal(l8, hls_cv[..., 1])
    np.testing.assert_array_equal(s8, hls_cv[..., 2])
    dh = np.abs(h8 - hls_cv[..., 0])
    assert dh.max() <= 1 and (dh > 0).mean() < 0.005

    rgb_cv = cv2.cvtColor(hls_cv.astype(np.uint8), cv2.COLOR_HLS2RGB)
    got = np.asarray(da._hls2rgb_u8(jnp.asarray(hls_cv[..., 0].astype(np.float32)),
                                    jnp.asarray(hls_cv[..., 1].astype(np.float32)),
                                    jnp.asarray(hls_cv[..., 2].astype(np.float32))))
    np.testing.assert_array_equal(got, rgb_cv.astype(np.float32))


def test_lightness_matches_host_change_light(rng):
    """Device lightness == host change_light (cv2 HLS path) for the same
    coefficient, up to the H-tie knife edges (<=0.01% of pixels)."""
    __import__("pytest").importorskip("cv2")
    from dis_yolo_tpu.data import augment as host
    img = rng.randint(0, 256, (96, 96, 3)).astype(np.uint8)
    for coeff in (0.5, 0.83, 1.2, 1.5):
        class _R:                       # host draws uniform()+0.5
            def uniform(self):
                return coeff - 0.5
        want = host.change_light(img, _R()).astype(np.float32)

        img255 = jnp.asarray(img.astype(np.float32))
        h8, l8, s8 = da._rgb2hls_u8(img255)
        l2 = jnp.floor(jnp.minimum(l8 * coeff, 255.0))
        got = np.asarray(da._hls2rgb_u8(h8, l2, s8))
        frac_diff = (np.abs(got - want) > 0).mean()
        assert frac_diff <= 1e-4, (coeff, frac_diff)


def test_motion_blur_matches_host_all_12_kernels(rng):
    """Device blur == host linear_motion_blur (cv2.filter2D) for every
    (angle, line-type) kernel, up to f32-vs-f64 .5 rounding knife edges."""
    __import__("pytest").importorskip("cv2")
    import cv2
    from dis_yolo_tpu.data.augment import _motion_kernel
    img = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    table = np.asarray(da._motion_kernel_table())
    angles = np.linspace(0, 180, 4, endpoint=False)
    for ai, ang in enumerate(angles):
        for ti, lt in enumerate(("right", "left", "full")):
            kern = _motion_kernel(3, float(ang), lt)
            np.testing.assert_allclose(table[ai * 3 + ti], kern, atol=1e-7)
            want = cv2.filter2D(img, -1, kern).astype(np.float64)

            x = jnp.asarray(img.astype(np.float32) / 255.0)
            xp = jnp.pad(x * 255.0, ((1, 1), (1, 1), (0, 0)), mode="reflect")
            acc = jnp.zeros_like(x)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + table[ai * 3 + ti][dy, dx] * xp[dy:dy + 48,
                                                                dx:dx + 48, :]
            raw = np.asarray(acc, np.float64)
            got = np.asarray(jnp.round(acc))
            # exclude exact-.5 knife edges (f32 kernel weights vs f64 host)
            safe = np.abs(raw - np.floor(raw) - 0.5) > 1e-3
            np.testing.assert_array_equal(got[safe], want[safe])


def test_device_augmented_train_step(small_cfg, rng):
    """Full jitted train step with device-side augs enabled runs + trains."""
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.train import train_step as ts
    from tests.test_train_step import make_batch
    cfg = small_cfg.replace(device_side_augs=True)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    step = ts.make_jitted_train_step(model, tx)
    state, metrics = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
