"""Device-resident training corpus: per-step wire = indices + box params.

The reference streams fully-assembled pixel batches from the host every
step (train_data.py:44-276 builds each example on CPU; sess.run feeds it,
train_yolo3_mask.py:158).  Even with this repo's compact uint8/bit-packed
wire format that is ~4.7 MB per 576^2/batch-2 step — on a network-attached
TPU the link, not the chip, sets the training pace (measured 77 MB/s
sustained => a 61 ms/step wire floor vs a 10.65 ms device step;
BENCHMARKS "K-step dispatch amortization").

This module removes the pixels from the wire entirely:

  * The decoded corpus (images + rasterized instance masks, both uint8 /
    bit-packed) uploads to HBM ONCE (~2 MB per 600^2 image, ~320 MB for
    the 160-image synthetic corpus).
  * Each step the host samples only the *decisions* — example index +
    scale/crop placement + placed boxes — using the exact RNG stream and
    rejection logic of the host loader (``dataset.sample_placement`` /
    ``boxes_to_net`` are shared code), and ships ~1 KB/step.
  * The pixel work (bilinear resize-and-place of image + masks onto the
    net canvas, YOLO label-grid scatter with the reference's first-wins
    occupied-cell rule) runs inside the jitted train step, fused by XLA
    with the existing device-side flip/photometric augs
    (data/device_augment.py) and the forward pass.

Parity: placement decisions, true-box clamping and the label grids are
bit-exact with the host loader (same code / integer math — see
tests/test_device_corpus.py).  The resized *pixels* differ from cv2's
fixed-point uint8 resize by at most 1 LSB (float bilinear with cv2's
pixel-center convention, round-half-even), and mask pixels only at exact
.5 bilinear knife edges — both measured in the parity tests and listed as
PARITY deviation #9.

Requires ``cfg.device_side_augs`` (host flips/photometric would need the
pixels the host no longer touches).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data import rasterize
from dis_yolo_tpu.data.dataset import (DefectTrainData, boxes_to_net,
                                       load_labels, sample_placement,
                                       _read_image)


# --------------------------------------------------------------------------
# corpus build (host, once) + upload
# --------------------------------------------------------------------------

@dataclasses.dataclass
class HostCorpus:
    """Decoded dataset in fixed-shape padded arrays (host copy).

    images       [N, Hm, Wm, 3] uint8 (zero-padded to the corpus max size)
    masks_packed [N, T, Hm*Wm/8] uint8 (np.packbits rows, keep-filtered
                 instance masks in build_example's census order)
    sizes        [N, 2] int32 (ih, iw) true per-image extents
    boxes        [N, T, 4] float32 (x1, y1, x2, y2) px, mask_to_box outputs
    classids     [N, T] int32
    nvalid       [N] int32
    """
    images: np.ndarray
    masks_packed: np.ndarray
    sizes: np.ndarray
    boxes: np.ndarray
    classids: np.ndarray
    nvalid: np.ndarray

    @property
    def n(self) -> int:
        return int(self.images.shape[0])

    @property
    def hw_max(self) -> Tuple[int, int]:
        return int(self.images.shape[1]), int(self.images.shape[2])

    def nbytes(self) -> int:
        return sum(getattr(self, f.name).nbytes
                   for f in dataclasses.fields(self))


def build_host_corpus(cfg: DISYoloConfig, phase: str = "train",
                      labels: Optional[List[Dict]] = None,
                      load_image=_read_image) -> HostCorpus:
    """Decode + rasterize the whole split once (build_example's census,
    dataset.py build_example / train_data.py:44-84, hoisted out of the
    per-step path)."""
    t = cfg.max_box_per_image
    c2i = cfg.class_to_ind()
    labels = labels if labels is not None else load_labels(cfg, phase)

    images, all_masks, sizes = [], [], []
    boxes_all = np.zeros((len(labels), t, 4), np.float32)
    cls_all = np.zeros((len(labels), t), np.int32)
    nvalid = np.zeros(len(labels), np.int32)
    for i, label in enumerate(labels):
        image = load_image(label["imname"])
        ih, iw = image.shape[:2]
        class_names = label["class_names"][:t]
        polys = label["polygons"][:t]
        masks = rasterize.instance_masks(polys, ih, iw, len(polys))
        boxes, keep = [], []
        for j in range(masks.shape[0]):
            bb = rasterize.mask_to_box(masks[j])
            if bb is None:
                continue
            boxes.append(bb)
            keep.append(j)
        n = len(keep)
        boxes_all[i, :n] = np.asarray(boxes, np.float32).reshape(n, 4)
        cls_all[i, :n] = [c2i[class_names[j]] for j in keep]
        nvalid[i] = n
        images.append(image)
        all_masks.append(masks[keep])
        sizes.append((ih, iw))

    hm = max(im.shape[0] for im in images)
    wm = max(im.shape[1] for im in images)
    img_arr = np.zeros((len(labels), hm, wm, 3), np.uint8)
    msk_arr = np.zeros((len(labels), t, hm * wm // 8 + (hm * wm % 8 > 0)),
                       np.uint8)
    for i, (im, ms) in enumerate(zip(images, all_masks)):
        ih, iw = im.shape[:2]
        img_arr[i, :ih, :iw] = im
        if len(ms):
            padded = np.zeros((len(ms), hm, wm), bool)
            padded[:, :ih, :iw] = ms.astype(bool)
            msk_arr[i, :len(ms)] = np.packbits(
                padded.reshape(len(ms), -1), axis=1)
    return HostCorpus(img_arr, msk_arr, np.asarray(sizes, np.int32),
                      boxes_all, cls_all, nvalid)


def upload_corpus(host: HostCorpus, sharding=None) -> Dict[str, jax.Array]:
    """One-time HBM residency for the pixel arrays (the per-step host path
    never touches them again)."""
    arrs = {"images": host.images, "masks_packed": host.masks_packed,
            "sizes": host.sizes}
    if sharding is not None:
        return {k: jax.device_put(v, sharding) for k, v in arrs.items()}
    return {k: jax.device_put(v) for k, v in arrs.items()}


# --------------------------------------------------------------------------
# host side of the per-step path: decisions only
# --------------------------------------------------------------------------

class CorpusTrainData(DefectTrainData):
    """Loader producing per-example *parameters* instead of pixels.

    Epoch/shuffle/cursor/prefetch discipline is inherited unchanged from
    DefectTrainData, and the placement RNG consumes the identical stream
    (``sample_placement`` is the shared canonical draw), so a corpus-mode
    run visits the same examples with the same placements as the wire-mode
    loader under the same seed.
    """

    def __init__(self, cfg: DISYoloConfig, phase: str = "train",
                 seed: int = 0, prefetch: int = 2,
                 labels: Optional[List[Dict]] = None,
                 corpus: Optional[HostCorpus] = None):
        assert cfg.device_side_augs, (
            "device_corpus requires cfg.device_side_augs=True: the host "
            "no longer holds pixels, so flips/photometric must run in the "
            "jitted step (data/device_augment.py)")
        super().__init__(cfg, phase, seed=seed, prefetch=prefetch,
                         labels=labels, host_augs=False)
        self.corpus = corpus if corpus is not None else \
            build_host_corpus(cfg, phase, labels=self.gt_labels)

    def _example(self) -> Dict[str, np.ndarray]:
        row = int(self.order[self.cursor])
        self.cursor += 1
        if self.cursor >= len(self.gt_labels):
            self.cursor = 0
            self.epoch += 1
            self.order = self.rng.permutation(len(self.gt_labels))
        cfg = self.cfg
        net = cfg.image_size
        t = cfg.max_box_per_image
        c = self.corpus
        ih, iw = int(c.sizes[row, 0]), int(c.sizes[row, 1])
        n = int(c.nvalid[row])
        boxes = c.boxes[row, :n]
        _, new_w, new_h, dx, dy = sample_placement(self.rng, iw, ih, net,
                                                   boxes)
        tb_px, _ = boxes_to_net(boxes, c.classids[row, :n], t,
                                new_w, new_h, dx, dy, iw, ih, net)
        # normalize on the HOST (numpy f32 divide, bit-exact with the wire
        # loader); the device only multiplies by reciprocals under XLA, a
        # 1-ULP deviation the grids/true_boxes must not carry
        tb_norm = tb_px.copy()
        tb_norm[:, :4] /= net
        return dict(idx=np.int32(row),
                    place=np.asarray([new_h, new_w, dy, dx], np.int32),
                    true_box_px=tb_px, true_box=tb_norm, nvalid=np.int32(n))

    def _make_batch(self) -> Dict[str, np.ndarray]:
        exs = [self._example() for _ in range(self.cfg.batch_size)]
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}


# --------------------------------------------------------------------------
# device side: assemble one batch from the resident corpus
# --------------------------------------------------------------------------

def _resize_place(src: jnp.ndarray, ih, iw, new_h, new_w, dy, dx,
                  size: int, pad_value: float) -> jnp.ndarray:
    """augment.place_and_pad on device: bilinear resize of ``src[:ih,:iw]``
    to (new_h, new_w), placed at (dx, dy) on a ``size``^2 canvas.

    Separable gathers with cv2's align-corners=False pixel-center
    convention ((o + 0.5) * src/dst - 0.5), edge-clamped taps, f32 math.
    src: [Hm, Wm, C] f32. Returns [size, size, C] f32.
    """
    ry = jnp.arange(size, dtype=jnp.float32) - dy          # resized-row coord
    rx = jnp.arange(size, dtype=jnp.float32) - dx
    fh = ih.astype(jnp.float32) / new_h.astype(jnp.float32)
    fw = iw.astype(jnp.float32) / new_w.astype(jnp.float32)
    sy = (ry + 0.5) * fh - 0.5
    sx = (rx + 0.5) * fw - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, ih - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, iw - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = jnp.clip(sy - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(sx - x0, 0.0, 1.0)[None, :, None]
    rows = src[y0] * (1.0 - wy) + src[y1] * wy             # [size, Wm, C]
    out = rows[:, x0] * (1.0 - wx) + rows[:, x1] * wx      # [size, size, C]
    valid = ((ry >= 0) & (ry < new_h.astype(jnp.float32)))[:, None, None] \
        & ((rx >= 0) & (rx < new_w.astype(jnp.float32)))[None, :, None]
    return jnp.where(valid, out, pad_value)


def _grids_one(tb_px: jnp.ndarray, tb_val: jnp.ndarray, nvalid: jnp.ndarray,
               anchors: jnp.ndarray, g: int, a: int, c: int, net: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """dataset.assign_anchors on device for one image.

    tb_px [T,5] = clamped (cx,cy,w,h,class) in net px — drives the anchor
    IoU and integer cell math.  tb_val [T,5] supplies the coordinate
    VALUES written into the grids (the caller passes the host-normalized
    boxes so no on-device division can drift by a ULP).  Best-anchor by
    wh-IoU, first-wins occupied-cell skip, zero-IoU drop — bit-exact with
    the host (tests/test_device_corpus.py).
    """
    t = tb_px.shape[0]
    wh = tb_px[:, 2:4]
    inter = (jnp.minimum(wh[:, None, 0], anchors[None, :, 0])
             * jnp.minimum(wh[:, None, 1], anchors[None, :, 1]))
    union = wh[:, 0:1] * wh[:, 1:2] + anchors[:, 0] * anchors[:, 1] - inter
    iou = inter / union                                     # [T,9]
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
    live = (jnp.arange(t) < nvalid) & (best_iou > 0)
    scale = best // a
    ai = best % a
    ms = jnp.asarray([4 * g, 2 * g, g], jnp.int32)
    m_of = ms[scale].astype(jnp.float32)
    x_ind = (tb_px[:, 0] * m_of / net).astype(jnp.int32)
    y_ind = (tb_px[:, 1] * m_of / net).astype(jnp.int32)
    # first-wins: box n loses if an earlier live box claims the same
    # (scale, y, x, ai) cell (assign_anchors' occupied check)
    code = ((scale * (4 * g) + y_ind) * (4 * g) + x_ind) * a + ai
    same = (code[None, :] == code[:, None]) & live[None, :]
    earlier = jnp.tril(jnp.ones((t, t), bool), k=-1)
    win = live & ~jnp.any(same & earlier, axis=1)

    onehot_c = jax.nn.one_hot(tb_px[:, 4].astype(jnp.int32), c,
                              dtype=jnp.float32)
    rows = jnp.concatenate([tb_val[:, :4], jnp.ones((t, 1), jnp.float32),
                            onehot_c], axis=1)              # [T, 5+c]
    grids = []
    for s, m in enumerate((4 * g, 2 * g, g)):
        grid = jnp.zeros((m, m, a, 5 + c), jnp.float32)
        sel = win & (scale == s)
        ys = jnp.where(sel, y_ind, m)                       # m => dropped
        grids.append(grid.at[ys, x_ind, ai].set(rows, mode="drop"))
    return tuple(grids)


def make_assemble_fn(cfg: DISYoloConfig):
    """Jit-friendly ``assemble(corpus, params) -> standard batch dict``.

    corpus: upload_corpus() output.  params: CorpusTrainData batch —
    idx [B] i32, place [B,4] i32 (new_h,new_w,dy,dx), true_box [B,T,5]
    f32 (net px, pre-normalization), nvalid [B] i32.

    Returns the expanded train-step batch: images uint8 [B,S,S,3],
    true_masks bool [B,T,S,S], true_boxes [B,1,1,1,T,5] (normalized),
    labels_s8/s16/s32, windows.
    """
    size = cfg.image_size
    t = cfg.max_box_per_image
    g, a, c = cfg.base_grid, cfg.anchors_per_scale, cfg.num_class
    net = float(size)
    anchors = jnp.asarray(np.asarray(cfg.anchors_array(), np.float32))

    def one(img_u8, msk_packed, hw, place, tb_px, tb_norm, nvalid):
        ih, iw = hw[0], hw[1]
        new_h, new_w, dy, dx = place[0], place[1], place[2], place[3]
        canvas = _resize_place(img_u8.astype(jnp.float32), ih, iw,
                               new_h, new_w, dy, dx, size, 127.0)
        canvas_u8 = jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)

        hm, wm = img_u8.shape[0], img_u8.shape[1]
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (msk_packed[..., None] >> shifts) & jnp.uint8(1)
        masks = bits.reshape(t, -1)[:, :hm * wm].reshape(t, hm, wm)
        placed = _resize_place(
            jnp.transpose(masks, (1, 2, 0)).astype(jnp.float32),
            ih, iw, new_h, new_w, dy, dx, size, 0.0)
        true_masks = jnp.transpose(jnp.round(placed), (2, 0, 1)).astype(bool)

        grids = _grids_one(tb_px, tb_norm, nvalid, anchors, g, a, c, net)
        return canvas_u8, true_masks, grids

    def assemble(corpus, p):
        imgs = corpus["images"][p["idx"]]
        msks = corpus["masks_packed"][p["idx"]]
        hws = corpus["sizes"][p["idx"]]
        canvas, true_masks, grids = jax.vmap(one)(
            imgs, msks, hws, p["place"], p["true_box_px"], p["true_box"],
            p["nvalid"])
        b = p["idx"].shape[0]
        return dict(
            images=canvas,
            true_masks=true_masks,
            true_boxes=p["true_box"][:, None, None, None],
            labels_s8=grids[0], labels_s16=grids[1], labels_s32=grids[2],
            windows=jnp.tile(jnp.asarray([0., 0., 1., 1.], jnp.float32),
                             (b, 1)),
        )

    return assemble
