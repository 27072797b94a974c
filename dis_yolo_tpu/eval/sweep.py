"""Shared detection-sweep driver for validation / test evaluation.

Extracts the batched predict loop (with fixed-shape tail padding) and the
grouped-by-original-size device-paste route from the CLI so the Solver's
periodic validation (train_yolo3_mask.py:156-204) and ``cli eval``
(calculate_test_map.py:203-269) run the same code — including the DP mesh
and device-paste fast paths.

Timing: returns the accumulated *device predict* wall time separately, so
callers can report device vs host-post time like the reference
(calculate_test_map.py:301-302 prints prediction and crop/assemble
separately).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api


def _pad_batch(b: int, imgs: np.ndarray, wins: np.ndarray):
    pad = b - imgs.shape[0]
    if pad:  # keep the jitted shape fixed on the tail batch
        imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                              imgs.dtype)])
        wins = np.concatenate([wins, np.tile([0., 0., 1., 1.], (pad, 1))
                              .astype(np.float32)])
    return imgs, wins


def _device_gt(gt_records: Dict[str, List[Dict]], names: List[str],
               h0: int, w0: int, idxs: List[int]):
    """Bit-pack one size-group's GT instance masks for device residence.

    Returns (packed [N,G,H,ceil(W/8)] uint8, areas [N,G] f32, row map).
    Instance order per image matches ``Evaluator.gt_masks`` (region order),
    which is the order ``voc_eval`` builds its per-class records in — the
    device IoU matrix columns line up with the host matcher by slicing the
    per-image class array.  GT is static across sweeps: uploaded once and
    cached, so repeated validation pays zero GT wire bytes.
    """
    g_max = max(1, max(len(gt_records[names[i]]) for i in idxs))
    wb = -(-w0 // 8)
    packed = np.zeros((len(idxs), g_max, h0, wb), np.uint8)
    areas = np.zeros((len(idxs), g_max), np.float32)
    rows = {}
    for r, i in enumerate(idxs):
        rows[names[i]] = r
        for g, obj in enumerate(gt_records[names[i]]):
            m = obj["mask"]
            assert m.shape == (h0, w0)
            packed[r, g] = np.packbits(m, axis=-1)
            areas[r, g] = float(m.sum(dtype=np.int64))   # exact: < 2^24
    return jnp.asarray(packed), jnp.asarray(areas), rows


def run_split(cfg: DISYoloConfig, model, variables, images: np.ndarray,
              names: List[str], windows: np.ndarray,
              device_paste: bool = False,
              gt_sizes: Optional[Dict[str, Tuple[int, int]]] = None,
              mesh=None, predict_fn=None,
              paste_cache: Optional[Dict] = None,
              timing: Optional[Dict[str, float]] = None,
              want_semantic: bool = True,
              device_score: bool = False,
              gt_records: Optional[Dict[str, List[Dict]]] = None,
              gt_semantic: Optional[Dict[str, np.ndarray]] = None
              ) -> Tuple[List[Dict], float]:
    """Predict a whole split; returns (detdata, device_predict_seconds).

    ``device_paste`` runs the on-device crop/resize/binarize/paste
    (ops/paste.py) grouped by original image size (one jitted program per
    distinct size), producing 'full_masks_packed' (bit-packed rows) /
    'valid'/'semantic' entries that ``Evaluator.evaluate_detections``
    consumes without the host ``detections_to_original`` stage; otherwise
    entries carry the raw [D,S,S] masks for the host route.  Compiles are excluded from the
    returned time (the reference's published number is steady-state).

    ``paste_cache``: caller-owned dict keyed by original size; pass a
    persistent one for repeated sweeps (Solver.validate every save_iter)
    so the per-size pasted programs compile once.

    ``device_score`` (needs ``gt_records`` = Evaluator.gt_masks): computes
    the det-vs-GT mask IoU matrix on device and returns entries
    {'boxes','valid','iou'} with NO mask fetch at all — the mAP-sweep fast
    path for network-attached chips (GT uploads once into ``paste_cache``
    and stays device-resident across sweeps).

    Timing attribution caveat: in the device_score route the mask scoring
    (IoU matrix / confusion) is part of the device program, so it lands in
    the returned device-predict seconds; the device_paste/host routes
    instead score masks on host inside the evaluator's ``t_post``.  When
    comparing per-mode timings (cli ms_pred/ms_post, bench_validate),
    compare TOTALS, not the pred/post split.
    """
    b = cfg.batch_size
    t_pred = 0.0

    if device_score:
        # IoU-matrix route: the det-vs-GT mask IoU is computed ON DEVICE
        # (ops/paste.mask_iou_single — bit-identical to the host popcount
        # scorer) and only [D,6] boxes + [D,G] floats come over the wire,
        # ~2.5 KB/img vs ~1.35 MB/img of packed masks.  On a tunneled chip
        # the sweep was wire-bound (BENCHMARKS "Validation sweep"); this
        # removes the mask transfer entirely.  mAP-only: callers needing
        # masks or semantic maps (cli infer/eval mIoU) use device_paste.
        assert gt_sizes is not None and gt_records is not None
        from dis_yolo_tpu.ops.paste import (mask_iou_batch,
                                            merged_semantic_single,
                                            paste_masks_single,
                                            semantic_confusion)
        want_conf = gt_semantic is not None   # device mIoU confusion too
        n_sem = cfg.num_class + 1

        def make_run_scored(h0, w0):
            def f(variables, imgs, wins, gt_p, gt_a, rows, gt_s=None):
                dets, masks = api.predict(model, variables, imgs, wins)
                full, valid = jax.vmap(
                    lambda m, d: paste_masks_single(m, d, h0, w0,
                                                    cfg.test_size)
                )(masks, dets)
                iou = mask_iou_batch(full, gt_p[rows], gt_a[rows])
                if gt_s is None:
                    return dets, valid, iou
                sem = jax.vmap(merged_semantic_single)(
                    full, dets[..., 4].astype(jnp.int32), valid)
                conf = jax.vmap(
                    lambda p, t: semantic_confusion(p, t, n_sem)
                )(sem, gt_s[rows])
                return dets, valid, iou, conf
            return jax.jit(f)

        cache = paste_cache if paste_cache is not None else {}
        # device-resident val images: a periodic sweep re-uploads the whole
        # split every save_iter otherwise (~1.3 MB/img on the wire).  Keyed
        # by host-array identity so a caller passing a different split can
        # never be served stale pixels.
        img_entry = cache.get("__imgs__")
        if img_entry is None or img_entry[0] is not images:
            img_entry = cache["__imgs__"] = (images, jnp.asarray(images))
        img_dev = img_entry[1]
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, nm in enumerate(names):
            groups.setdefault(tuple(gt_sizes[nm]), []).append(i)
        jobs = []
        for (h0, w0), idxs in groups.items():
            gt_key = ("__gt__", h0, w0)
            if gt_key not in cache:     # one-time GT upload, reused forever
                cache[gt_key] = _device_gt(gt_records, names, h0, w0, idxs)
            gt_p, gt_a, row_of = cache[gt_key]
            gt_s = None
            if want_conf:
                sem_key = ("__gtsem__", h0, w0)
                if sem_key not in cache:   # one-time GT-semantic upload
                    # ordered by the cached __gt__ row map (not this call's
                    # idxs order): the jitted program indexes BOTH stacks
                    # with the same `rows`, so a persistent cache reused by
                    # a caller enumerating the same images in a different
                    # order must not let the two stacks drift (ADVICE r4)
                    stack = np.zeros((len(row_of), h0, w0), np.uint8)
                    for i in idxs:
                        stack[row_of[names[i]]] = gt_semantic[names[i]]
                    cache[sem_key] = jnp.asarray(stack)
                gt_s = cache[sem_key]
            run_s = cache.get(("score", h0, w0, want_conf))
            if run_s is None:
                run_s = cache[("score", h0, w0, want_conf)] = \
                    make_run_scored(h0, w0)
                warm = _pad_batch(b, images[idxs[:1]], windows[idxs[:1]])
                wargs = (gt_p, gt_a, jnp.zeros((b,), jnp.int32)) \
                    + ((gt_s,) if want_conf else ())
                np.asarray(run_s(variables, jnp.asarray(warm[0]),
                                 jnp.asarray(warm[1]), *wargs)[0])
            for v in range(0, len(idxs), b):
                sel = idxs[v:v + b]
                rows = [row_of[names[i]] for i in sel]
                rows = rows + [rows[-1]] * (b - len(rows))   # pad rows too
                jobs.append((run_s, sel, gt_p, gt_a,
                             np.asarray(rows, np.int32), gt_s))

        by_name: Dict[str, Dict] = {}

        def fetch(entry):
            sel, out = entry
            tf0 = time.time()
            dets, valid, iou = (np.asarray(out[0]), np.asarray(out[1]),
                                np.asarray(out[2]))
            conf = np.asarray(out[3]) if len(out) > 3 else None
            if timing is not None:
                timing["fetch_s"] = (timing.get("fetch_s", 0.)
                                     + time.time() - tf0)
            for i, ix in enumerate(sel):
                entry = {"imname": names[ix], "boxes": dets[i],
                         "valid": valid[i], "iou": iou[i]}
                if conf is not None:
                    entry["confusion"] = conf[i]
                by_name[names[ix]] = entry

        t0 = time.time()
        inflight: List = []
        for run_s, sel, gt_p, gt_a, rows, gt_s in jobs:
            # batch by DEVICE gather from the resident split (tail batches
            # pad by repeating the last index — per-image programs never
            # read the padded slots' results, `sel` bounds the fetch)
            sel_pad = list(sel) + [sel[-1]] * (b - len(sel))
            imgs = img_dev[jnp.asarray(sel_pad)]
            wins = windows[sel]
            if len(sel) < b:
                wins = np.concatenate(
                    [wins, np.tile([0., 0., 1., 1.],
                                   (b - len(sel), 1)).astype(np.float32)])
            extra = (gt_s,) if gt_s is not None else ()
            out = run_s(variables, imgs, jnp.asarray(wins),
                        gt_p, gt_a, jnp.asarray(rows), *extra)
            inflight.append((sel, out))
            if len(inflight) > 2:
                fetch(inflight.pop(0))
        for entry in inflight:
            fetch(entry)
        t_pred += time.time() - t0
        return [by_name[nm] for nm in names], t_pred

    if device_paste:
        assert gt_sizes is not None, "device_paste needs per-image sizes"
        from dis_yolo_tpu.ops.paste import pack_mask_bits, paste_masks_batch

        def make_run_pasted(h0, w0):
            def f(variables, imgs, wins):
                dets, masks = api.predict(model, variables, imgs, wins)
                full, valid, sem = paste_masks_batch(masks, dets, h0, w0,
                                                     cfg.test_size)
                # bit-pack before the fetch: the sweep is transfer-bound on
                # a network-attached chip (1 byte/pixel bool -> 8 px/byte)
                out = (dets, pack_mask_bits(full), valid)
                # the full-res semantic map (1 byte/px) only feeds mIoU
                # (cli eval); the Solver's periodic mAP sweep skips its
                # compute AND its wire bytes (XLA dead-code-eliminates it)
                return out + ((sem,) if want_semantic else ())
            return jax.jit(f)

        cache = paste_cache if paste_cache is not None else {}
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, nm in enumerate(names):
            groups.setdefault(tuple(gt_sizes[nm]), []).append(i)
        jobs = []
        for (h0, w0), idxs in groups.items():
            run_p = cache.get((h0, w0, want_semantic))
            if run_p is None:
                run_p = cache[(h0, w0, want_semantic)] = make_run_pasted(h0, w0)
                # compile, untimed — only on first build: a per-sweep warm
                # call costs a full extra batch through the device link
                warm = _pad_batch(b, images[idxs[:1]], windows[idxs[:1]])
                np.asarray(run_p(variables, jnp.asarray(warm[0]),
                                 jnp.asarray(warm[1]))[0])
            for v in range(0, len(idxs), b):
                jobs.append((run_p, idxs[v:v + b], w0))

        # PIPELINED dispatch: jax dispatch is async, only the np.asarray
        # fetch blocks — issuing batch t+1 before fetching batch t overlaps
        # device compute with the (tunnel-RTT-dominated) wire transfer.
        # The serial loop paid RTT + compute + transfer per batch.
        by_name: Dict[str, Dict] = {}

        def fetch(entry):
            (sel, w0), out = entry
            tf0 = time.time()
            dets, packed = np.asarray(out[0]), np.asarray(out[1])
            valid = np.asarray(out[2])
            sem = np.asarray(out[3]) if len(out) > 3 else None
            if timing is not None:
                timing["fetch_s"] = (timing.get("fetch_s", 0.)
                                     + time.time() - tf0)
            # masks stay bit-packed: the evaluator's popcount IoU consumes
            # them directly (voc_eval.packed_overlaps) — the host unpack
            # pass measured 94 ms/img at 576² and is gone entirely
            for i, ix in enumerate(sel):
                entry = {"imname": names[ix], "boxes": dets[i],
                         "full_masks_packed": packed[i], "valid": valid[i]}
                if sem is not None:
                    entry["semantic"] = sem[i]
                by_name[names[ix]] = entry

        t0 = time.time()
        inflight: List = []
        for run_p, sel, w0 in jobs:
            imgs, wins = _pad_batch(b, images[sel], windows[sel])
            out = run_p(variables, jnp.asarray(imgs), jnp.asarray(wins))
            inflight.append(((sel, w0), out))
            if len(inflight) > 2:
                fetch(inflight.pop(0))
        for entry in inflight:
            fetch(entry)
        t_pred += time.time() - t0
        return [by_name[nm] for nm in names], t_pred

    run = predict_fn or api.make_jitted_predict(model, mesh=mesh)
    if not getattr(run, "_dyt_warmed", False):
        warm = jnp.zeros((b,) + images.shape[1:], images.dtype)
        np.asarray(run(variables, warm,
                       jnp.tile(jnp.asarray([0., 0., 1., 1.]), (b, 1)))[0])
        try:
            run._dyt_warmed = True
        except AttributeError:   # jitted callables normally allow attrs
            pass
    detdata: List[Dict] = []
    n = len(names)

    def fetch(entry):
        v, out = entry
        dets, masks = np.asarray(out[0]), np.asarray(out[1])
        for i in range(min(b, n - v)):
            detdata.append({"imname": names[v + i], "boxes": dets[i],
                            "masks": masks[i]})

    # pipelined dispatch (see the device_paste route above)
    t0 = time.time()
    inflight: List = []
    for v in range(0, n, b):
        imgs, wins = _pad_batch(b, images[v:v + b], windows[v:v + b])
        out = run(variables, jnp.asarray(imgs), jnp.asarray(wins))
        inflight.append((v, out))
        if len(inflight) > 2:
            fetch(inflight.pop(0))
    for entry in inflight:
        fetch(entry)
    t_pred += time.time() - t0
    return detdata, t_pred
