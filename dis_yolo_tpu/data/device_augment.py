"""Device-side (jitted) augmentation — the TPU fast path.

The reference does every augmentation on the host with cv2/numpy
(train_data.py:189-253); flips in particular triple-loop over label grids.
This module implements the flip and photometric stages as batched jax
transforms that run *inside the jitted train step*, so the host only
letterboxes and rasterizes.

Semantics mirror the host path on the already-normalized batch:
  * flip draw per image: 1=none, 2=horizontal, 3=vertical (uniform thirds)
  * images/masks mirrored; true-box centers x -> (net-1)/net - x
    (the reference flips in pixel space with net-1-x then divides by net)
  * label grids mirrored along the spatial axis with the same center fixup
    applied at object cells
  * photometric: 1 none / 2 salt&pepper / 3 HLS-lightness / 4 directional
    motion blur, matching the host dispatch order (code order,
    train_data.py:393-401).  Lightness is the *exact* uint8 HLS round-trip
    (cv2-compatible float32 emulation — L and S bit-exact, H ties-at-.5
    knife edges only, measured <=0.003% of pixels end-to-end); blur draws
    one of the reference's 12 length-3 line kernels (4 quantized angles x
    full/left/right, train_data.py:466-493) and convolves with cv2's
    reflect-101 border + uint8 rounding.  Parity per dispatch vs the host
    path in tests/test_device_augment.py.

Use ``augment_batch`` on the 7-field batch with the step PRNG key.  Host
flips/photometrics should be disabled when this path is active
(DefectTrainData(..., host_augs=False)).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def _flip_boxes(tb: jnp.ndarray, coord: int, net: float) -> jnp.ndarray:
    """true_boxes [...,T,5]: mirror one center coordinate of nonzero rows."""
    valid = jnp.any(tb[..., :4] != 0, axis=-1)
    flipped = (net - 1.0) / net - tb[..., coord]
    return tb.at[..., coord].set(jnp.where(valid, flipped, tb[..., coord]))


def _flip_grid(grid: jnp.ndarray, axis: int, net: float) -> jnp.ndarray:
    """Label grid [H,W,A,5+C]: mirror spatially + fix the center coord."""
    grid = jnp.flip(grid, axis=axis)
    coord = 1 if axis == 0 else 0
    obj = grid[..., 4] == 1
    fixed = (net - 1.0) / net - grid[..., coord]
    return grid.at[..., coord].set(jnp.where(obj, fixed, grid[..., coord]))


def _apply_flip_single(flip: jnp.ndarray, ex: Dict[str, jnp.ndarray],
                       net: float) -> Dict[str, jnp.ndarray]:
    def none_fn(e):
        return e

    def hflip(e):
        return dict(
            image=e["image"][:, ::-1, :],
            true_masks=e["true_masks"][:, :, ::-1],
            true_box=_flip_boxes(e["true_box"], 0, net),
            labels_s8=_flip_grid(e["labels_s8"], 1, net),
            labels_s16=_flip_grid(e["labels_s16"], 1, net),
            labels_s32=_flip_grid(e["labels_s32"], 1, net),
        )

    def vflip(e):
        return dict(
            image=e["image"][::-1, :, :],
            true_masks=e["true_masks"][:, ::-1, :],
            true_box=_flip_boxes(e["true_box"], 1, net),
            labels_s8=_flip_grid(e["labels_s8"], 0, net),
            labels_s16=_flip_grid(e["labels_s16"], 0, net),
            labels_s32=_flip_grid(e["labels_s32"], 0, net),
        )

    return jax.lax.switch(flip - 1, [none_fn, hflip, vflip], ex)


def _rgb2hls_u8(img255: jnp.ndarray):
    """uint8-valued RGB [H,W,3] -> (H, L, S) uint8-valued floats.

    Strict float32 emulation of cv2.COLOR_RGB2HLS on 8-bit input (scale by
    1/255f, compute in f32, round*255 / round*0.5 for H): L and S are
    bit-exact vs cv2; H differs only on exact-.5 rounding ties of the hue
    (measured 0.014% of random pixels — SIMD tie-breaking inside cv2).
    """
    f = jnp.float32
    x = img255.astype(jnp.float32) * f(1.0 / 255.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    l = (vmax + vmin) * f(0.5)
    diff = vmax - vmin
    s = jnp.where(l < f(0.5),
                  diff / jnp.maximum(vmax + vmin, f(1e-20)),
                  diff / jnp.maximum(f(2.0) - (vmax + vmin), f(1e-20)))
    s = jnp.where(diff == 0, f(0.0), s)
    dinv = f(60.0) / jnp.maximum(diff, f(1e-20))
    h = jnp.where(vmax == r, (g - b) * dinv,
                  jnp.where(vmax == g, (b - r) * dinv + f(120.0),
                            (r - g) * dinv + f(240.0)))
    h = jnp.where(diff == 0, f(0.0), h)
    h = jnp.where(h < 0, h + f(360.0), h)
    return (jnp.round(h * f(0.5)), jnp.round(l * f(255.0)),
            jnp.round(s * f(255.0)))


def _hls2rgb_u8(h8: jnp.ndarray, l8: jnp.ndarray, s8: jnp.ndarray):
    """uint8-valued (H, L, S) -> uint8-valued RGB [H,W,3] floats.

    Bit-exact vs cv2.COLOR_HLS2RGB on 8-bit input (verified on random
    images in tests/test_device_augment.py)."""
    f = jnp.float32
    h = h8.astype(jnp.float32) * f(2.0)
    l = l8.astype(jnp.float32) * f(1.0 / 255.0)
    s = s8.astype(jnp.float32) * f(1.0 / 255.0)
    q = jnp.where(l < f(0.5), l * (1 + s), l + s - l * s)
    p = f(2.0) * l - q

    def chan(hh):
        hh = jnp.mod(hh, f(360.0)) * f(1.0 / 360.0)
        return jnp.where(hh < 1 / 6, p + (q - p) * 6 * hh,
                         jnp.where(hh < 1 / 2, q,
                                   jnp.where(hh < 2 / 3,
                                             p + (q - p) * (f(2 / 3) - hh) * 6,
                                             p)))

    rgb = jnp.stack([chan(h + 120), chan(h), chan(h - 120)], axis=-1)
    return jnp.clip(jnp.round(rgb * f(255.0)), 0.0, 255.0)


@functools.lru_cache(maxsize=1)
def _motion_kernel_table():
    """The reference's 12 possible 3x3 motion kernels as a static table.

    linearmotion_blur3C (train_data.py:466-493) draws a length-3 line
    kernel from 4 quantized angles {0,45,90,135} x 3 line types
    {right, left, full}; index = angle_idx * 3 + type_idx.  Returned as
    numpy (NOT a jax array: the cache may be populated inside a jit trace,
    and a cached tracer would leak into later traces).
    """
    from dis_yolo_tpu.data.augment import _motion_kernel
    import numpy as np
    angles = np.linspace(0, 180, 4, endpoint=False)
    ks = [_motion_kernel(3, float(a), t)
          for a in angles for t in ("right", "left", "full")]
    return np.stack(ks).astype(np.float32)


def _photometric_single(key: jax.Array, bnl: jnp.ndarray,
                        img: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def none_fn(x):
        return x

    def salt_pepper(x):
        # amount .004, salt fraction .2 — salt writes 1/255 like the host
        # path's uint8 quirk (augment.add_salt_pepper_noise); the host's
        # randint(0, s-1) never draws the last row/col, so exclude it here
        # too.  Per-pixel Bernoulli instead of exact counts (deviation #3).
        u = jax.random.uniform(k1, x.shape[:2])
        hitable = jnp.ones(x.shape[:2], bool).at[-1, :].set(False
                                                            ).at[:, -1].set(False)
        salt = ((u < 0.004 * 0.2) & hitable)[..., None]
        pepper = ((u > 1.0 - 0.004 * 0.8) & hitable)[..., None]
        return jnp.where(salt, 1.0 / 255.0, jnp.where(pepper, 0.0, x))

    def lightness(x):
        # exact change_light (train_data.py:522-531): uint8 HLS round-trip,
        # L * U(0.5,1.5) clamped at 255, truncating uint8 cast (np.array
        # dtype=uint8 truncates, not rounds)
        coeff = jax.random.uniform(k2, (), minval=0.5, maxval=1.5)
        img255 = jnp.round(x * 255.0)
        h8, l8, s8 = _rgb2hls_u8(img255)
        l2 = jnp.floor(jnp.minimum(l8 * coeff, 255.0))
        return _hls2rgb_u8(h8, l2, s8) / 255.0

    def blur(x):
        # exact linearmotion_blur3C: one of 12 length-3 line kernels,
        # correlation with cv2.filter2D's default reflect-101 border and
        # uint8 rounding of the result
        aidx = jax.random.randint(k3, (), 0, 4)
        tidx = jax.random.randint(k4, (), 0, 3)
        kern = jnp.asarray(_motion_kernel_table())[aidx * 3 + tidx]   # [3,3]
        xp = jnp.pad(x * 255.0, ((1, 1), (1, 1), (0, 0)), mode="reflect")
        hgt, wid = x.shape[0], x.shape[1]
        acc = jnp.zeros_like(x)
        for dy in range(3):
            for dx in range(3):
                acc = acc + kern[dy, dx] * xp[dy:dy + hgt, dx:dx + wid, :]
        return jnp.round(acc) / 255.0

    return jax.lax.switch(bnl - 1, [none_fn, salt_pepper, lightness, blur], img)


def augment_batch(key: jax.Array, batch: Dict[str, jnp.ndarray],
                  image_size: int, flips: bool = True,
                  photometric: bool = True) -> Dict[str, jnp.ndarray]:
    """Batched device-side flips + photometric on the standard 7-field batch."""
    b = batch["images"].shape[0]
    kf, kp, kd = jax.random.split(key, 3)
    net = float(image_size)

    out = dict(batch)
    if flips:
        draws = jax.random.randint(kf, (b,), 1, 4)
        tb = batch["true_boxes"][:, 0, 0, 0]          # [B,T,5]

        def one(flip, image, masks, tbi, g8, g16, g32):
            ex = dict(image=image, true_masks=masks, true_box=tbi,
                      labels_s8=g8, labels_s16=g16, labels_s32=g32)
            return _apply_flip_single(flip, ex, net)

        res = jax.vmap(one)(draws, batch["images"], batch["true_masks"],
                            tb, batch["labels_s8"], batch["labels_s16"],
                            batch["labels_s32"])
        out.update(images=res["image"], true_masks=res["true_masks"],
                   true_boxes=res["true_box"][:, None, None, None],
                   labels_s8=res["labels_s8"], labels_s16=res["labels_s16"],
                   labels_s32=res["labels_s32"])

    if photometric:
        draws = jax.random.randint(kp, (b,), 1, 5)
        keys = jax.random.split(kd, b)
        out["images"] = jax.vmap(_photometric_single)(keys, draws, out["images"])
    return out
