"""Scan-chain vs unrolled-chain timing: is lax.scan taxing the forward?

The xplane trace puts the deploy batch-1 forward at ~1.9 ms on device,
while chain_scan_time reports 4.4-10 ms/step.  Both chains below are
equally honest (data dependence between iterations, one host fetch of a
scalar reduced from every step — nothing can be elided); the unrolled
variant just lets XLA assign layouts freely instead of pinning a
loop-invariant carry layout and re-slicing weights every scan iteration.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_chain_methods.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm, deploy_variables
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def timed_call(fn, x, n_exec, repeats=3):
    float(fn(x))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_exec


def chains(body, x0, n):
    @jax.jit
    def scan_chain(x):
        def step(c, _):
            out = body(c)
            s = jnp.sum(out)
            return c + s * 1e-20, s
        _, outs = jax.lax.scan(step, x, None, length=n)
        return outs.sum()

    @jax.jit
    def unrolled_chain(x):
        acc = jnp.float32(0.0)
        for _ in range(n):
            out = body(x)
            s = jnp.sum(out)
            acc = acc + s
            x = x + s * 1e-20
        return acc

    return scan_chain, unrolled_chain


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)

    for label, deploy in (("folded", False), ("deploy", True)):
        cfg = DISYoloConfig()
        v = api.init_variables(cfg, jax.random.PRNGKey(0))
        if deploy:
            cfg = cfg.replace(deploy=True)
            variables = deploy_variables(v)
        else:
            variables = fold_batchnorm(api.create_model(cfg), v)
        model = api.create_model(cfg)
        img = jnp.asarray(rng.rand(1, 576, 576, 3).astype(np.float32))

        def body(x):
            raws = api.forward(model, variables, x, train=False)
            return sum(r.sum() for r in raws)

        for n in (20, 60):
            scan_c, unroll_c = chains(body, img, n)
            t_scan = timed_call(scan_c, img, n)
            print(f"{label} n={n}: scan {t_scan*1e3:.2f} ms/step", flush=True)
            if n == 20:  # unrolled compile of 60 copies is slow; 20 suffices
                t_unroll = timed_call(unroll_c, img, n)
                print(f"{label} n={n}: unrolled {t_unroll*1e3:.2f} ms/step",
                      flush=True)


if __name__ == "__main__":
    main()
