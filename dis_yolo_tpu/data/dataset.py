"""Training data pipeline: labels, rasterization cache, augmentation,
anchor assignment, batched prefetch.

Behavioral port of ``defect_train`` (train_data.py) with TPU-minded fixes:

  * polygon rasterization is *cached* (bit-packed) instead of being redone
    from scratch every epoch (train_data.py:79)
  * the anchor best-IoU assignment is vectorized over the 9 anchors
    (:149-180), keeping the occupied-cell skip semantics
  * flip label-grid fixups are vectorized (no triple Python loops, :198-236)
  * a background thread prefetches batches so the TPU never waits on cv2

Batch layout (the reference 7-tuple, train_data.py:276):
  images     [B, S, S, 3] float32 (/255)
  true_masks [B, T, S, S] bool
  true_boxes [B, 1, 1, 1, T, 5]  normalized (xc, yc, w, h, classid)
  labels_s8  [B, 4g, 4g, A, 5+C]  (the reference's yolo_3)
  labels_s16 [B, 2g, 2g, A, 5+C]  (yolo_2)
  labels_s32 [B,  g,  g, A, 5+C]  (yolo_1)
  windows    [B, 4] = (0, 0, 1, 1) during training
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data import augment, rasterize

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


# --------------------------------------------------------------------------
# label loading
# --------------------------------------------------------------------------

def load_labels(cfg: DISYoloConfig, phase: str) -> List[Dict]:
    """gt_labels list [{'imname', 'class_names', 'polygons'}, ...].

    Mirrors defect_train.load_labels (train_data.py:278-319) including the
    derived-cache pickle.
    """
    split_dir = cfg.data_path(phase)
    cache_dir = os.path.join(split_dir, "cache")
    derived = os.path.join(cache_dir, f"gt_labels_{phase}.pkl")
    if os.path.isfile(derived):
        with open(derived, "rb") as f:
            return pickle.load(f)

    with open(os.path.join(cache_dir, "ground_truth_cache.pkl"), "rb") as f:
        annotations = pickle.load(f)
    annotations = [a for a in annotations if a["regions"]]

    with open(os.path.join(cache_dir, f"{phase}.txt")) as f:
        index = [x.strip() for x in f.readlines()]
    assert len(index) == len(annotations)

    gt_labels = []
    for i, stem in enumerate(index):
        a = annotations[i]
        assert os.path.splitext(a["filename"])[0] == stem
        regions = a["regions"]
        polygons = [r["shape_attributes"] for r in regions.values()]
        class_names = [r["region_attributes"] for r in regions.values()]
        gt_labels.append({
            "imname": os.path.join(split_dir, "images", a["filename"]),
            "class_names": class_names,
            "polygons": polygons,
        })
    os.makedirs(cache_dir, exist_ok=True)
    with open(derived, "wb") as f:
        pickle.dump(gt_labels, f)
    return gt_labels


# --------------------------------------------------------------------------
# rasterization cache
# --------------------------------------------------------------------------

class MaskCache:
    """LRU of bit-packed rasterized instance masks keyed by image name."""

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self._store: Dict[str, Tuple] = {}
        self._order: List[str] = []
        self._lock = threading.Lock()

    def get(self, key: str):
        with self._lock:
            if key in self._store:
                self._order.remove(key)
                self._order.append(key)
                packed, shape, n = self._store[key]
                masks = np.unpackbits(packed, count=n * shape[0] * shape[1])
                return masks.reshape(n, *shape).astype(bool)
            return None

    def put(self, key: str, masks: np.ndarray):
        with self._lock:
            packed = np.packbits(masks.astype(np.uint8))
            self._store[key] = (packed, masks.shape[1:], masks.shape[0])
            self._order.append(key)
            if len(self._order) > self.capacity:
                evict = self._order.pop(0)
                del self._store[evict]


class ImageCache:
    """Byte-bounded LRU of decoded RGB uint8 images keyed by path.

    The loader re-decodes every image each epoch (cv2.imread + cvtColor was
    8.5 ms of the 30 ms single-core example floor at 576^2); a typical
    defect split (a few hundred ~1 MB decoded images) fits comfortably in
    RAM, so decode amortizes to the first epoch.  Purely a host-side cache:
    byte-identical pixels come out.
    """

    def __init__(self, capacity_mb: int = 512):
        self.capacity = capacity_mb * (1 << 20)
        self._store: Dict[str, np.ndarray] = {}
        self._order: List[str] = []
        self._bytes = 0
        self._lock = threading.Lock()

    def load(self, imname: str, read=None) -> np.ndarray:
        with self._lock:
            img = self._store.get(imname)
            if img is not None:
                self._order.remove(imname)
                self._order.append(imname)
                return img
        img = (read or _read_image)(imname)
        if img.nbytes <= self.capacity:
            with self._lock:
                if imname not in self._store:
                    self._store[imname] = img
                    self._order.append(imname)
                    self._bytes += img.nbytes
                    while self._bytes > self.capacity:
                        evict = self._order.pop(0)
                        self._bytes -= self._store.pop(evict).nbytes
        return img


# --------------------------------------------------------------------------
# anchor assignment
# --------------------------------------------------------------------------

def assign_anchors(boxes_px: np.ndarray, classids: np.ndarray,
                   cfg: DISYoloConfig) -> List[np.ndarray]:
    """Fill the 3 label grids for one image.

    boxes_px: [N, 4] (xc, yc, w, h) in net pixels; classids [N].
    Returns [labels_s8 (4g), labels_s16 (2g), labels_s32 (g)] — same order
    as the reference's ``yolos`` list indexed by best_anchor//3
    (train_data.py:63, :169).  Keeps the occupied-cell skip and the
    "no anchor iou>0" drop.
    """
    g, a, c = cfg.base_grid, cfg.anchors_per_scale, cfg.num_class
    net = float(cfg.image_size)
    anchors = cfg.anchors_array()                                   # [9,2]
    grids = [np.zeros((m, m, a, 5 + c), np.float32) for m in (4 * g, 2 * g, g)]

    if len(boxes_px) == 0:
        return grids
    wh = boxes_px[:, 2:4]                                           # [N,2]
    inter = (np.minimum(wh[:, None, 0], anchors[None, :, 0])
             * np.minimum(wh[:, None, 1], anchors[None, :, 1]))     # [N,9]
    union = wh[:, 0:1] * wh[:, 1:2] + anchors[:, 0] * anchors[:, 1] - inter
    iou = inter / union
    best = np.argmax(iou, axis=1)
    best_iou = iou[np.arange(len(boxes_px)), best]

    for n in range(len(boxes_px)):
        if best_iou[n] <= 0:
            print("No anchor has iou > 0 for this ground-truth box")
            continue
        scale = best[n] // a
        ai = best[n] % a
        grid = grids[scale]
        m = grid.shape[0]
        x_ind = int(boxes_px[n, 0] * m / net)
        y_ind = int(boxes_px[n, 1] * m / net)
        if grid[y_ind, x_ind, ai, 4] == 1:                          # occupied
            continue
        grid[y_ind, x_ind, ai, 0:4] = boxes_px[n, :4]
        grid[y_ind, x_ind, ai, 4] = 1.0
        grid[y_ind, x_ind, ai, 5 + int(classids[n])] = 1.0
    return grids


def _flip_grid(grid: np.ndarray, axis: int, net: float) -> np.ndarray:
    """Flip a label grid and fix the flipped center coordinate (pixels)."""
    grid = grid[::-1, :, :, :] if axis == 0 else grid[:, ::-1, :, :]
    grid = grid.copy()
    coord = 1 if axis == 0 else 0     # cy for vertical flip, cx for horizontal
    obj = grid[..., 4] == 1
    grid[..., coord] = np.where(obj, net - 1 - grid[..., coord], grid[..., coord])
    return grid


# --------------------------------------------------------------------------
# example assembly (pure function of (cfg, label, rng) — shared by the
# sequential loader and the worker pool)
# --------------------------------------------------------------------------

def _read_image(imname: str) -> np.ndarray:
    img = cv2.imread(imname)
    if img is None:
        raise FileNotFoundError(imname)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def sample_placement(rng: np.random.RandomState, iw: int, ih: int, net: int,
                     boxes: np.ndarray) -> Tuple[int, int, int, int, int]:
    """Draw the scale/crop placement for one example (RNG-order canonical).

    Exactly the draw sequence of the reference's per-item body
    (train_data.py:86-132): one scale_crop coin, then (branch 2 only) the
    AR-jitter/scale/offset uniforms, then the keep-all-defects rejection
    that falls back to the centered letterbox when any GT box would be
    cut.  Shared by ``build_example`` (host pixel path) and the
    device-corpus param sampler (data/device_corpus.py) so both paths
    consume an identical RNG stream and make identical decisions.
    """
    sc, new_w, new_h, dx, dy = augment.sample_scale_crop(rng, iw, ih, net, net)
    if sc == 2 and len(boxes):
        sx, sy = new_w / iw, new_h / ih
        x1 = boxes[:, 0] * sx + dx
        y1 = boxes[:, 1] * sy + dy
        x2 = boxes[:, 2] * sx + dx
        y2 = boxes[:, 3] * sy + dy
        if (x1.min() < 0 or y1.min() < 0 or
                x2.max() >= net or y2.max() >= net):
            sc = 1
            new_w, new_h, dx, dy = augment.identity_placement(iw, ih, net, net)
    return sc, new_w, new_h, dx, dy


def boxes_to_net(boxes: np.ndarray, classids: np.ndarray, t: int,
                 new_w: int, new_h: int, dx: int, dy: int, iw: int, ih: int,
                 net: int) -> Tuple[np.ndarray, np.ndarray]:
    """Placed + clamped (cx, cy, w, h) boxes in net pixels
    (train_data.py:135-147).  Returns (true_box [t,5], boxes_net [n,4])."""
    sx, sy = new_w / iw, new_h / ih
    tb = np.zeros((t, 5), np.float32)
    boxes_net = np.zeros((len(boxes), 4), np.float32)
    for n in range(len(boxes)):
        x1 = max(min(boxes[n, 0] * sx + dx, net - 1), 0)
        y1 = max(min(boxes[n, 1] * sy + dy, net - 1), 0)
        x2 = max(min(boxes[n, 2] * sx + dx, net - 1), 0)
        y2 = max(min(boxes[n, 3] * sy + dy, net - 1), 0)
        boxes_net[n] = [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]
        tb[n, :4] = boxes_net[n]
        tb[n, 4] = classids[n]
    return tb, boxes_net


def build_example(cfg: DISYoloConfig, label: Dict,
                  rng: np.random.RandomState, host_augs: bool,
                  mask_cache: Optional[MaskCache] = None,
                  load_image=_read_image) -> Dict[str, np.ndarray]:
    """One augmented training example (train_data.py:44-276 per-item body).

    All randomness comes from ``rng``; callers own the seeding discipline
    (the sequential loader threads one stream through consecutive calls,
    the worker pool derives an independent per-example stream so batches
    are identical for any worker count).
    """
    net = cfg.image_size
    t = cfg.max_box_per_image
    c2i = cfg.class_to_ind()

    image = load_image(label["imname"])
    ih, iw = image.shape[:2]
    class_names = label["class_names"][:t]
    if len(label["polygons"]) > t:
        print(f"More than {t} instances in {label['imname']}")

    masks = None
    if mask_cache is not None:
        key = f"{id(label)}:{label['imname']}"
        cached = mask_cache.get(key)
        if cached is not None and cached.shape[1:] == (ih, iw):
            masks = cached
    if masks is None:
        polys = label["polygons"][:t]
        masks = rasterize.instance_masks(polys, ih, iw, len(polys))
        if mask_cache is not None:
            mask_cache.put(key, masks)

    boxes, keep = [], []
    for i in range(masks.shape[0]):
        bb = rasterize.mask_to_box(masks[i])
        if bb is None:
            continue
        boxes.append(bb)
        keep.append(i)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)       # x1y1x2y2 px
    classids = np.asarray([c2i[class_names[i]] for i in keep], np.int64)
    masks = masks[keep]

    # ---- aug 1: random scale/crop, rejected if any box gets cut ----
    sc, new_w, new_h, dx, dy = sample_placement(rng, iw, ih, net, boxes)

    # boxes -> clamped (cx, cy, w, h) in net pixels (train_data.py:135-147)
    tb, boxes_net = boxes_to_net(boxes, classids, t, new_w, new_h, dx, dy,
                                 iw, ih, net)

    grids = assign_anchors(boxes_net, classids, cfg)

    # ---- aug 2: random h/v flip (train_data.py:189-236) ----
    flip = rng.randint(1, 4) if (cfg.flipped and host_augs) else 1
    if flip == 2:     # horizontal
        tb[: len(boxes), 0] = net - 1 - tb[: len(boxes), 0]
        grids = [_flip_grid(g, 1, net) for g in grids]
    elif flip == 3:   # vertical
        tb[: len(boxes), 1] = net - 1 - tb[: len(boxes), 1]
        grids = [_flip_grid(g, 0, net) for g in grids]

    # ---- aug 3: photometric (code-order dispatch, :393-401) ----
    bnl = rng.randint(1, 5) if (cfg.blur_noise_light and host_augs) else 1

    img_net = augment.place_and_pad(image, new_w, new_h, dx, dy,
                                    net, net, pad_value=127)
    if flip == 2:
        img_net = img_net[:, ::-1, :]
    elif flip == 3:
        img_net = img_net[::-1, :, :]
    img_net = augment.apply_photometric(
        np.ascontiguousarray(img_net).astype(np.uint8), bnl, rng)

    # ---- masks -> net canvas, flipped, bit-packed ----
    n = len(boxes)
    packed = np.zeros((t, net * net // 8), np.uint8)
    if n:
        out_masks = np.empty((n, net, net), bool)
        for i in range(n):
            m = augment.place_and_pad(masks[i].astype(np.float32),
                                      new_w, new_h, dx, dy, net, net, 0.0)
            if flip == 2:
                m = m[:, ::-1, :]
            elif flip == 3:
                m = m[::-1, :, :]
            out_masks[i] = np.around(m[:, :, 0]).astype(bool)
        packed[:n] = np.packbits(out_masks.reshape(n, -1), axis=1)

    # ---- normalize coordinates (/net, train_data.py:258-261) ----
    tb[:, :4] /= net
    for g in grids:
        g[..., 0:4] /= net

    # Compact wire format: uint8 image (the /255 fuses into the first conv
    # on device) and bit-packed masks — 2.5x fewer bytes through the pool
    # result pipe, the prefetch queue AND the host->device link (which
    # dominates wall clock on a network-attached chip).  The device side
    # expands exactly (train_step.prepare_batch); expand_batch is the host
    # analog for eval/tests.
    return dict(image_u8=img_net, masks_packed=packed,
                true_box=tb, grids=grids)


def collate(exs: List[Dict[str, np.ndarray]],
            cfg: DISYoloConfig) -> Dict[str, np.ndarray]:
    """Stack example dicts into the (compact) reference 7-tuple layout:

      images       [B, S, S, 3] uint8  (f32/255 happens on device)
      masks_packed [B, T, S*S/8] uint8 (np.packbits rows of true_masks)
      true_boxes / labels_s8/s16/s32 / windows as documented above.
    """
    b = len(exs)
    return dict(
        images=np.stack([e["image_u8"] for e in exs]),
        masks_packed=np.stack([e["masks_packed"] for e in exs]),
        true_boxes=np.stack([e["true_box"] for e in exs])[:, None, None, None],
        labels_s8=np.stack([e["grids"][0] for e in exs]),
        labels_s16=np.stack([e["grids"][1] for e in exs]),
        labels_s32=np.stack([e["grids"][2] for e in exs]),
        windows=np.tile(np.asarray([0., 0., 1., 1.], np.float32), (b, 1)),
    )


def expand_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side inverse of the compact format (f32 images + bool masks).

    Bit-exact with what the device-side ``train_step.prepare_batch``
    computes; no-op for already-expanded batches.
    """
    batch = dict(batch)
    if batch["images"].dtype == np.uint8:
        batch["images"] = batch["images"].astype(np.float32) / 255.0
    if "masks_packed" in batch:
        packed = batch.pop("masks_packed")
        b, t = packed.shape[:2]
        s = batch["images"].shape[1]
        bits = np.unpackbits(packed, axis=-1, count=s * s)
        batch["true_masks"] = bits.reshape(b, t, s, s).astype(bool)
    return batch


# --------------------------------------------------------------------------
# the loader
# --------------------------------------------------------------------------

class DefectTrainData:
    """Epoch-shuffled batched training loader with background prefetch."""

    def __init__(self, cfg: DISYoloConfig, phase: str = "train",
                 seed: int = 0, prefetch: int = 2,
                 labels: Optional[List[Dict]] = None,
                 host_augs: bool = True):
        self.cfg = cfg
        self.phase = phase
        # host_augs=False defers flips + photometric to the device-side
        # jitted path (data/device_augment.py); scale/crop stays host-side
        # (it changes the anchor assignment).
        self.host_augs = host_augs
        self.rng = np.random.RandomState(seed)
        self.gt_labels = labels if labels is not None else load_labels(cfg, phase)
        self.order = self.rng.permutation(len(self.gt_labels))
        self.cursor = 0
        self.epoch = 1
        self.mask_cache = MaskCache()
        self.image_cache = ImageCache()
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # ---- raw example assembly ------------------------------------------

    def _load_image(self, imname: str) -> np.ndarray:
        return self.image_cache.load(imname)

    def _example(self) -> Dict[str, np.ndarray]:
        label = self.gt_labels[self.order[self.cursor]]
        self.cursor += 1
        if self.cursor >= len(self.gt_labels):
            self.cursor = 0
            self.epoch += 1
            self.order = self.rng.permutation(len(self.gt_labels))
        return build_example(self.cfg, label, self.rng, self.host_augs,
                             self.mask_cache, self._load_image)

    # ---- batching + prefetch ------------------------------------------

    def _make_batch(self) -> Dict[str, np.ndarray]:
        return collate([self._example() for _ in range(self.cfg.batch_size)],
                       self.cfg)

    def get(self) -> Dict[str, np.ndarray]:
        """Next batch (synchronous)."""
        return self._make_batch()

    def start_prefetch(self):
        if self._thread is not None:
            return
        # restartable: Solver.train stops the thread when it returns, and a
        # later train()/resume on the same Solver must be able to bring it
        # back — with the event still set the fresh worker would exit
        # immediately and next_prefetched() would block forever
        self._stop.clear()

        def worker():
            while not self._stop.is_set():
                batch = self._make_batch()
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def next_prefetched(self) -> Dict[str, np.ndarray]:
        if self._thread is None:
            return self.get()
        return self._queue.get()

    def stop(self):
        self._stop.set()
        self._thread = None


# --------------------------------------------------------------------------
# multiprocess loader
# --------------------------------------------------------------------------
#
# The sequential DefectTrainData assembles examples on ONE GIL-bound thread
# (~60 ms/batch at 576^2 b2: cv2 decode + skimage rasterize + numpy augs).
# That floor makes real training host-bound once the device step dips below
# it (VERDICT r3 weak #1).  ParallelTrainData fans _example() out over a
# fork pool.  Determinism is worker-count-invariant by construction:
#
#   * the epoch shuffle comes from a dedicated order RNG (seeded `seed`)
#     advanced only on the task-issuing side, and
#   * example number g (a global counter) draws all its augmentation
#     randomness from an independent RandomState seeded by
#     SeedSequence([seed, g]) —
#
# so any pool width (including the inline workers=0 fallback) yields
# bit-identical batches.  This replaces — rather than reproduces — the
# sequential loader's single RNG stream; DefectTrainData keeps the old
# stream for backwards compatibility with recorded runs.

_W_STATE: Dict = {}


def _pool_init(cfg, labels, host_augs, seed):
    # cv2's internal thread pool can deadlock across fork; run it inline.
    if cv2 is not None:
        try:
            cv2.setNumThreads(0)
        except Exception:
            pass
    _W_STATE.update(cfg=cfg, labels=labels, host_augs=host_augs, seed=seed,
                    cache=MaskCache(), images=ImageCache())


def _example_rng(seed: int, g: int) -> np.random.RandomState:
    return np.random.RandomState(
        np.random.SeedSequence([seed, g]).generate_state(4))


def _pool_example(task):
    label_idx, g = task
    st = _W_STATE
    return build_example(st["cfg"], st["labels"][label_idx],
                         _example_rng(st["seed"], g), st["host_augs"],
                         st["cache"], st["images"].load)


class ParallelTrainData(DefectTrainData):
    """Worker-pool training loader, deterministic for any worker count.

    ``workers=0`` assembles examples inline (no pool, no prefetch thread
    needed) with the same per-example RNG scheme — the reference batch
    stream for the parity test.  ``workers=None`` uses every host core.

    ``host_shard=(process_index, process_count)`` makes this host build
    only its rows of each *global* batch (cfg.batch_size is the global
    size): global batch t row r is example g = t*B + r, and host p owns
    rows [p*B/n, (p+1)*B/n).  Because example g's randomness depends only
    on (seed, g), the per-host batches concatenated in process order are
    bit-identical to the unsharded stream — the property the multi-process
    DP test asserts against the single-process dryrun.
    """

    def __init__(self, cfg: DISYoloConfig, phase: str = "train",
                 seed: int = 0, prefetch: int = 4,
                 labels: Optional[List[Dict]] = None,
                 host_augs: bool = True, workers: Optional[int] = None,
                 host_shard: Optional[Tuple[int, int]] = None):
        super().__init__(cfg, phase, seed=seed, prefetch=prefetch,
                         labels=labels, host_augs=host_augs)
        self.seed = seed
        self.workers = (os.cpu_count() or 1) if workers is None else workers
        if host_shard is not None:
            pid, n = host_shard
            assert 0 <= pid < n and cfg.batch_size % n == 0, (host_shard,
                                                              cfg.batch_size)
        self.host_shard = host_shard
        self._g = 0
        self._pool = None

    def _local_batch(self) -> int:
        if self.host_shard is None:
            return self.cfg.batch_size
        return self.cfg.batch_size // self.host_shard[1]

    def _owns(self, g: int) -> bool:
        if self.host_shard is None:
            return True
        pid, n = self.host_shard
        per = self.cfg.batch_size // n
        return (g % self.cfg.batch_size) // per == pid

    def _next_task(self) -> Tuple[int, int]:
        """Next OWNED (label_idx, g); the task stream (epoch shuffle and
        example counter) advances through skipped rows so every host sees
        the same global ordering."""
        while True:
            label_idx = int(self.order[self.cursor])
            self.cursor += 1
            if self.cursor >= len(self.gt_labels):
                self.cursor = 0
                self.epoch += 1
                self.order = self.rng.permutation(len(self.gt_labels))
            g = self._g
            self._g += 1
            if self._owns(g):
                return label_idx, g

    def _example(self) -> Dict[str, np.ndarray]:
        label_idx, g = self._next_task()
        return build_example(self.cfg, self.gt_labels[label_idx],
                             _example_rng(self.seed, g), self.host_augs,
                             self.mask_cache, self.image_cache.load)

    def _make_batch(self) -> Dict[str, np.ndarray]:
        return collate([self._example() for _ in range(self._local_batch())],
                       self.cfg)

    def start_prefetch(self):
        if self._thread is not None:
            return
        if self.workers == 0:
            return super().start_prefetch()
        self._stop.clear()
        import multiprocessing as mp
        ctx = mp.get_context("fork")
        self._pool = ctx.Pool(self.workers, initializer=_pool_init,
                              initargs=(self.cfg, self.gt_labels,
                                        self.host_augs, self.seed))

        def task_iter():
            # consumed by the pool's internal task-feeder thread; it stays
            # ~(workers + pool buffering) tasks ahead of the results
            while not self._stop.is_set():
                yield self._next_task()

        results = self._pool.imap(_pool_example, task_iter(), chunksize=1)
        b = self._local_batch()

        def worker():
            try:
                while not self._stop.is_set():
                    batch = collate([next(results) for _ in range(b)], self.cfg)
                    while not self._stop.is_set():
                        try:
                            self._queue.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except (StopIteration, OSError, ValueError):
                pass  # pool torn down under us during stop()

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def stop(self):
        super().stop()
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
