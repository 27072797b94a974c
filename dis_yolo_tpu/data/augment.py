"""Host-side photometric/geometric augmentation primitives.

Behavioral ports of train_data.py's augmentation suite, with the pyblur
dependency replaced by a native numpy/cv2 motion-blur kernel:

  * scale/crop placement + letterbox padding (value 127 for images, 0 for
    masks) — apply_random_scale_and_crop (train_data.py:437-464)
  * salt & pepper noise — add_salt_pepper_noise (:505-520)
  * HLS lighting change  — change_light (:522-531)
  * linear motion blur   — linearmotion_blur3C (:466-493); the reference
    draws a length-3 line kernel at a random quantized angle with type
    'full'/'left'/'right' (pyblur LinearMotionBlur); reproduced here as an
    explicit convolution kernel.

NOTE (aug-dispatch quirk): in the reference, `image_read` maps bnl=2 ->
salt&pepper noise, 3 -> light, 4 -> motion blur (train_data.py:393-401)
despite comments claiming 2=blur; the code is authoritative and we follow it.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def resize_bilinear(img: np.ndarray, w: int, h: int) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    # numpy fallback: align-corners=False bilinear, cv2-compatible
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) + 0.5) * src_h / h - 0.5
    xs = (np.arange(w) + 0.5) * src_w / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, src_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, src_w - 1)
    y1 = np.clip(y0 + 1, 0, src_h - 1)
    x1 = np.clip(x0 + 1, 0, src_w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    if img.ndim == 2:
        img = img[:, :, None]
    out = ((img[y0][:, x0] * (1 - wy)[..., None] + img[y1][:, x0] * wy[..., None])
           * (1 - wx)[..., None]
           + (img[y0][:, x1] * (1 - wy)[..., None] + img[y1][:, x1] * wy[..., None])
           * wx[..., None])
    return out.squeeze()


def place_and_pad(image: np.ndarray, new_w: int, new_h: int, dx: int, dy: int,
                  net_w: int, net_h: int, pad_value: float) -> np.ndarray:
    """Resize to (new_w, new_h) then place at (dx, dy) in a padded canvas.

    Exact semantics of apply_random_scale_and_crop: negative offsets crop,
    positive offsets pad with ``pad_value``; result is [net_h, net_w, C].
    """
    im = resize_bilinear(image, new_w, new_h)
    if im.ndim == 2:
        im = im[:, :, None]
    # One canvas fill + one slice copy. Output pixel (y, x) is
    # resized[y - dy, x - dx] when that lands inside the resized image and
    # pad_value otherwise — exactly what the original crop-negative-offsets /
    # pad-positive-offsets / final-crop chain computed, without the up-to-4
    # intermediate np.pad reallocations (~3 ms/example at 576^2 in the
    # loader-floor profile).
    src_y0, src_x0 = max(-dy, 0), max(-dx, 0)
    dst_y0, dst_x0 = max(dy, 0), max(dx, 0)
    h_copy = min(new_h - src_y0, net_h - dst_y0)
    w_copy = min(new_w - src_x0, net_w - dst_x0)
    out = np.full((net_h, net_w, im.shape[2]), pad_value, im.dtype)
    if h_copy > 0 and w_copy > 0:
        out[dst_y0:dst_y0 + h_copy, dst_x0:dst_x0 + w_copy] = \
            im[src_y0:src_y0 + h_copy, src_x0:src_x0 + w_copy]
    return out


def sample_scale_crop(rng: np.random.RandomState, image_w: int, image_h: int,
                      net_w: int, net_h: int,
                      jitter: float = 0.2) -> Tuple[int, int, int, int, int]:
    """Sample (scale_crop_flag, new_w, new_h, dx, dy) like train_data.py:86-132.

    The caller is responsible for rejecting the jittered placement when any
    GT box would be cropped (the reference's keep-all-defects check).
    """
    scale_crop = rng.randint(1, 3)
    if scale_crop == 2:
        new_ar = (image_w / image_h * rng.uniform(1 - jitter, 1 + jitter)
                  / rng.uniform(1 - jitter, 1 + jitter))
        scale = rng.uniform(0.75, 1.5)
        if new_ar < 1:
            new_h = int(scale * net_h)
            new_w = int(new_h * new_ar)
        else:
            new_w = int(scale * net_w)
            new_h = int(new_w / new_ar)
        dx = int(rng.uniform(0, net_w - new_w))
        dy = int(rng.uniform(0, net_h - new_h))
        return 2, new_w, new_h, dx, dy
    return (1,) + identity_placement(image_w, image_h, net_w, net_h)


def identity_placement(image_w: int, image_h: int, net_w: int,
                       net_h: int) -> Tuple[int, int, int, int]:
    """Centered aspect-preserving letterbox (the scale_crop==1 branch)."""
    new_ar = image_w / image_h
    if new_ar < 1:
        new_h = int(net_h)
        new_w = int(new_h * new_ar)
    else:
        new_w = int(net_w)
        new_h = int(new_w / new_ar)
    dx = (net_w - new_w) // 2
    dy = (net_h - new_h) // 2
    return new_w, new_h, dx, dy


def add_salt_pepper_noise(im: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """In-place salt (=1!) & pepper (=0) on uint8 pixels (train_data.py:505-520).

    Faithfully keeps the reference's quirk that 'salt' writes value 1 (not
    255) into the uint8 image.
    """
    amount, salt_vs_pepper = 0.004, 0.2
    num_salt = int(np.ceil(amount * im.size * salt_vs_pepper))
    num_pepper = int(np.ceil(amount * im.size * (1.0 - salt_vs_pepper)))
    coords = [rng.randint(0, s - 1, num_salt) for s in im.shape[:2]]
    im[coords[0], coords[1], :] = 1
    coords = [rng.randint(0, s - 1, num_pepper) for s in im.shape[:2]]
    im[coords[0], coords[1], :] = 0
    return im


def change_light(image: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Scale HLS lightness by U(0.5, 1.5) (train_data.py:522-531).

    The reference's float64 round-trip (`hls.astype(f64); L*=coeff;
    min(...,255); astype(u8)`) maps each uint8 L value independently, so it
    collapses to a 256-entry LUT on the L channel — bit-exact (the same
    multiply / clamp / C-truncation per value) at ~1/20 the cost of
    materializing two full-image float64 copies (the loader-floor profile
    had this at 29 ms/call on a 576^2 image).
    """
    coeff = rng.uniform() + 0.5
    if cv2 is None:
        return np.clip(image.astype(np.float64) * coeff, 0, 255).astype(np.uint8)
    hls = cv2.cvtColor(image, cv2.COLOR_RGB2HLS)
    lut = np.minimum(np.arange(256, dtype=np.float64) * coeff,
                     255).astype(np.uint8)
    hls[:, :, 1] = lut[hls[:, :, 1]]
    return cv2.cvtColor(hls, cv2.COLOR_HLS2RGB)


def _motion_kernel(dim: int, angle_deg: float, line_type: str) -> np.ndarray:
    """Length-``dim`` line kernel at ``angle_deg``; 'left'/'right' use half."""
    k = np.zeros((dim, dim), np.float64)
    c = dim // 2
    rad = math.radians(angle_deg)
    dxy = (math.cos(rad), -math.sin(rad))
    span = {"full": range(-c, c + 1), "right": range(0, c + 1),
            "left": range(-c, 1)}[line_type]
    for t in span:
        x = int(round(c + t * dxy[0]))
        y = int(round(c + t * dxy[1]))
        if 0 <= x < dim and 0 <= y < dim:
            k[y, x] = 1.0
    return k / max(k.sum(), 1.0)


def linear_motion_blur(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """pyblur LinearMotionBlur replacement: dim=3 line kernel, random
    quantized angle, random 'full'/'left'/'right' (train_data.py:466-493)."""
    dim = 3  # reference restricts to 3 to keep thin cracks visible (:480)
    center = dim // 2
    n_angles = center * 4
    angles = np.linspace(0, 180, n_angles, endpoint=False)
    angle = float(angles[rng.randint(0, len(angles))])
    line_type = ["right", "left", "full"][rng.randint(0, 3)]
    kernel = _motion_kernel(dim, angle, line_type)
    if cv2 is not None:
        return cv2.filter2D(img, -1, kernel)
    out = np.zeros_like(img, np.float64)
    pad = center
    padded = np.pad(img.astype(np.float64), ((pad, pad), (pad, pad), (0, 0)),
                    mode="edge")
    for dy in range(dim):
        for dx in range(dim):
            if kernel[dy, dx]:
                out += kernel[dy, dx] * padded[dy:dy + img.shape[0],
                                               dx:dx + img.shape[1]]
    return out.astype(img.dtype)


def apply_photometric(image: np.ndarray, bnl: int,
                      rng: np.random.RandomState) -> np.ndarray:
    """Dispatch following the *code* (train_data.py:393-401), not the comments:
    2 -> salt&pepper, 3 -> light, 4 -> motion blur."""
    if bnl == 2:
        return add_salt_pepper_noise(image, rng)
    if bnl == 3:
        return change_light(image, rng)
    if bnl == 4:
        return linear_motion_blur(image, rng)
    return image
