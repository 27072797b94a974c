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
  * photometric: 1 none / 2 salt&pepper / 3 brightness / 4 blur (3x3 mean
    approximation of the reference's length-3 motion kernel), matching the
    host dispatch order (code order, train_data.py:393-401).  Brightness
    scales RGB by U(0.5, 1.5) — a documented approximation of the HLS
    lightness scaling (exact HLS round-trip is host-only).

Use ``augment_batch`` on the 7-field batch with the step PRNG key.  Host
flips/photometrics should be disabled when this path is active
(DefectTrainData(..., host_augs=False)).
"""

from __future__ import annotations

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


def _photometric_single(key: jax.Array, bnl: jnp.ndarray,
                        img: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3 = jax.random.split(key, 3)

    def none_fn(x):
        return x

    def salt_pepper(x):
        # amount .004, salt fraction .2 — salt writes 1/255 like the host
        # path's uint8 quirk (augment.add_salt_pepper_noise)
        u = jax.random.uniform(k1, x.shape[:2])
        salt = (u < 0.004 * 0.2)[..., None]
        pepper = (u > 1.0 - 0.004 * 0.8)[..., None]
        return jnp.where(salt, 1.0 / 255.0, jnp.where(pepper, 0.0, x))

    def brightness(x):
        coeff = jax.random.uniform(k2, (), minval=0.5, maxval=1.5)
        return jnp.clip(x * coeff, 0.0, 1.0)

    def blur(x):
        # separable 3-tap mean along a random axis ~ length-3 motion blur
        horiz = jax.random.bernoulli(k3)
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
        h = (xp[1:-1, :-2] + xp[1:-1, 1:-1] + xp[1:-1, 2:]) / 3.0
        v = (xp[:-2, 1:-1] + xp[1:-1, 1:-1] + xp[2:, 1:-1]) / 3.0
        return jnp.where(horiz, h, v)

    return jax.lax.switch(bnl - 1, [none_fn, salt_pepper, brightness, blur], img)


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
