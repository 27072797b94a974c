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


def run_split(cfg: DISYoloConfig, model, variables, images: np.ndarray,
              names: List[str], windows: np.ndarray,
              device_paste: bool = False,
              gt_sizes: Optional[Dict[str, Tuple[int, int]]] = None,
              mesh=None, predict_fn=None,
              paste_cache: Optional[Dict] = None,
              timing: Optional[Dict[str, float]] = None,
              want_semantic: bool = True) -> Tuple[List[Dict], float]:
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
    """
    b = cfg.batch_size
    t_pred = 0.0

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
