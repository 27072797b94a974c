"""Profiling hooks: jax.profiler traces + chain-scan micro-timing.

The reference's only instrumentation is wall-clock Timers
(train_yolo3_mask.py:118-119, calculate_test_map.py:195-196); here we add

  * ``trace(logdir)`` — context manager around ``jax.profiler`` for full
    XLA/TPU traces viewable in TensorBoard/Perfetto
  * ``chain_scan_time`` — the *honest* device-timing primitive for
    remote-attached TPUs: N data-dependent executions inside one
    ``lax.scan`` with a host fetch of a scalar reduced from every step.
    Plain dispatch loops under-report by orders of magnitude (unconsumed
    outputs may never execute; ``block_until_ready`` over a tunnel measures
    dispatch+RTT, not compute).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chain_scan_time(body: Callable, x0, n: int = 20, repeats: int = 3,
                    n2: int = 0, args: tuple = ()) -> float:
    """Median seconds per execution of ``body`` (x -> scalar-reducible out).

    ``body`` must accept the carry (same shape/dtype as ``x0``) and return
    an array; a tiny multiple of its sum is folded back into the carry so
    no iteration can be elided.

    ``args``: extra operands forwarded as ``body(c, *args)`` and passed as
    jit *arguments*, not closure constants.  Closed-over device arrays are
    embedded into the HLO as literals; at train-bench scale (a ~750 MB
    TrainState + batch) that inflates the remote-compile payload past the
    tunnel's request limit (HTTP 413 observed at batch 32).

    Two-point slope method: chains of length ``n`` and ``n2`` (default 3n)
    are timed and the per-step time is (T(n2) - T(n)) / (n2 - n).  A
    single-chain division T(n)/n smears the *fixed* per-fetch cost — tunnel
    RTT + host sync, measured at 50-75 ms on this remote-attached chip —
    into every step (at n=20 that inflated a 1.3 ms forward to 5 ms); the
    slope is the honest steady-state per-execution device time, which is
    also what the reference's per-image number reports (an amortized loop
    over hundreds of images, calculate_test_map.py:301-302).
    """
    n2 = n2 or 3 * n

    def make_chain(length):
        @jax.jit
        def chain(x, *a):
            def step(c, _):
                out = body(c, *a)
                s = jnp.sum(out)
                # cast keeps a non-f32 carry (e.g. a bf16 activation) from
                # being dtype-promoted, which scan rejects
                return c + (s * 1e-20).astype(c.dtype), s
            _, outs = jax.lax.scan(step, x, None, length=length)
            return outs.sum()
        return chain

    def run(chain):
        float(chain(x0, *args))            # compile + warm
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain(x0, *args))        # host fetch forces execution
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t1 = run(make_chain(n))
    t2 = run(make_chain(n2))
    return max(t2 - t1, 0.0) / (n2 - n)
