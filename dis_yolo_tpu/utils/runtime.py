"""Runtime helpers: persistent compilation cache + device batch prefetch.

Two production lessons baked into the framework:

  * ``enable_compilation_cache`` — JAX's persistent executable cache works
    with the TPU backend and removes multi-minute recompiles on process
    restart (crash recovery / preemption resume).
  * ``device_prefetch`` — ``jax.device_put`` is asynchronous; keeping a
    small queue of already-transferred batches overlaps host->device
    transfer with the previous step's compute.  On remote-attached
    devices (high host-link latency) this hides most of the per-step
    transfer cost.
"""

from __future__ import annotations

import collections
import os
from typing import Iterable, Iterator, Optional

import jax


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_secs: float = 2.0) -> Optional[str]:
    """Turn on the persistent compilation cache (idempotent).

    Directory from the argument, $DIS_YOLO_COMPILE_CACHE, or
    ~/.cache/dis_yolo_tpu_xla.  Returns the directory used (None if the
    current jax version rejects the options).
    """
    cache_dir = (cache_dir or os.environ.get("DIS_YOLO_COMPILE_CACHE")
                 or os.path.expanduser("~/.cache/dis_yolo_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        return cache_dir
    except Exception:
        return None


def device_prefetch(batches: Iterable, size: int = 2,
                    sharding=None) -> Iterator:
    """Yield batches already resident on device, ``size`` transfers ahead.

    Transfers run on a worker thread: on backends where ``jax.device_put``
    blocks until the bytes land (e.g. network-attached devices), issuing
    the put from the consumer thread would serialize upload with compute.
    """
    import concurrent.futures

    queue: collections.deque = collections.deque()
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def put(b):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), b)
        return jax.tree.map(jax.device_put, b)

    it = iter(batches)
    try:
        while len(queue) < size:
            queue.append(pool.submit(put, next(it)))
    except StopIteration:
        pass
    try:
        while queue:
            fut = queue.popleft()
            try:
                queue.append(pool.submit(put, next(it)))
            except StopIteration:
                pass
            yield fut.result()
    finally:
        try:
            pool.shutdown(wait=False, cancel_futures=True)
        except Exception:   # interpreter teardown: queue module already gone
            pass


def calibrate_threshold(model, variables, images, cfg,
                        min_survivors: Optional[int] = None) -> float:
    """Detection threshold making the pipeline carry a full detection load.

    Benchmarks on untrained weights need a threshold that reproduces the
    candidate regime of a *trained* net at the reference's 0.25 cut: a
    near-zero threshold declares every anchor valid (~20k candidates — a
    pathological NMS load, and it trips the exact full-candidate fallback
    that real serving almost never takes), while a high one empties the
    detection slots and flatters the masking stages.  Runs one forward,
    computes the reference's class-specific confidence (sigmoid(obj) * max
    softmax class, yolo3_net_pos.py:544-548) and picks the smallest
    candidate count whose host greedy per-class NMS yields >= min_survivors
    (default ``cfg.max_detection``, i.e. every fixed detection slot does
    real assembly/paste work).  Returns that count's score as threshold.
    """
    import numpy as np

    from dis_yolo_tpu.models import api as _api
    from dis_yolo_tpu.ops.decode import decode_all

    min_survivors = min_survivors or cfg.max_detection
    raws = _api.forward(model, variables, images, train=False)
    preds = decode_all(raws[:3], cfg)
    confs, probs, boxes = [], [], []
    for p in preds:
        r = np.asarray(p.conf_logit, np.float32)[..., 0]
        confs.append((1.0 / (1.0 + np.exp(-r))).reshape(-1))
        logits = np.asarray(p.class_logit, np.float32)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        prob = e / e.sum(axis=-1, keepdims=True)
        probs.append(prob.reshape(-1, prob.shape[-1]))
        cx = np.asarray(p.norm_coord, np.float32).reshape(-1, 4)
        y1 = cx[:, 1] - cx[:, 3] / 2
        x1 = cx[:, 0] - cx[:, 2] / 2
        boxes.append(np.stack([y1, x1, y1 + cx[:, 3], x1 + cx[:, 2]], 1))
    prob = np.concatenate(probs)
    score = np.concatenate(confs) * prob.max(-1)
    cls = prob.argmax(-1)
    box = np.clip(np.concatenate(boxes), 0.0, 1.0)
    order = np.argsort(-score, kind="stable")

    def survivors(n):
        keep = []
        for i in order[:n]:
            a = box[i]
            ok = True
            for j in keep:
                if cls[j] != cls[i]:
                    continue
                b = box[j]
                ih = min(a[2], b[2]) - max(a[0], b[0])
                iw = min(a[3], b[3]) - max(a[1], b[1])
                if ih <= 0 or iw <= 0:
                    continue
                inter = ih * iw
                ua = ((a[2] - a[0]) * (a[3] - a[1])
                      + (b[2] - b[0]) * (b[3] - b[1]) - inter)
                if ua > 0 and inter / ua > cfg.iou_threshold:
                    ok = False
                    break
            if ok:
                keep.append(i)
                if len(keep) >= min_survivors:
                    return len(keep)
        return len(keep)

    n = 64
    while n < min(score.size, cfg.pre_nms_top_k):
        if survivors(n) >= min_survivors:
            break
        n *= 2
    n = min(n, score.size - 1)
    return float(np.sort(score)[::-1][n])
