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
