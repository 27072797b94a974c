"""Batch-1 forward MFU investigation (VERDICT r1 weak #2 / next #4).

Probes, all chain-scan timed (the only honest method on the tunneled chip):
  1. full forward: folded-ConvBN graph vs true deploy graph (DeployConv,
     no BatchNorm module, no f32 casts) at 576/288, batch 1/4
  2. per-conv fixed-overhead microbenchmarks: N identical convs chained
  3. optional: jax.profiler trace of the deploy forward, parsed with
     jax.profiler.ProfileData to rank ops by self time

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_forward.py [trace]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm, deploy_variables
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def fwd_time(cfg, variables, batch, n=20):
    model = api.create_model(cfg)
    img = jnp.asarray(np.random.RandomState(0)
                      .rand(batch, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))

    def body_all(x):  # consume every output so nothing is elided
        raws = api.forward(model, variables, x, train=False)
        return sum(r.sum() for r in raws)
    return chain_scan_time(body_all, img, n=n)


def conv_chain_time(ch, size, kernel, n_layers=20, batch=1):
    """Time one 3x3 conv at (size^2, ch->ch) by chaining n_layers of them."""
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (kernel, kernel, ch, ch), jnp.bfloat16) * 0.01
    x = jax.random.normal(k, (batch, size, size, ch), jnp.bfloat16)

    def body(x):
        y = x
        for _ in range(n_layers):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(0.1 * y, y)
        return y.sum()

    t = chain_scan_time(body, x, n=5)
    per_conv = t / n_layers
    flops = 2 * batch * size * size * ch * ch * kernel * kernel
    return per_conv, flops / per_conv / 1e12


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    results = {}
    for size in (576, 288):
        for batch in (1, 4):
            cfg = DISYoloConfig(image_size=size)
            v = api.init_variables(cfg, jax.random.PRNGKey(0))
            folded = fold_batchnorm(api.create_model(cfg), v)
            t_fold = fwd_time(cfg, folded, batch)

            dcfg = cfg.replace(deploy=True)
            dv = deploy_variables(v)
            t_dep = fwd_time(dcfg, dv, batch)
            results[(size, batch)] = (t_fold, t_dep)
            print(f"size={size} batch={batch}: folded ConvBN "
                  f"{t_fold*1e3/batch:.2f} ms/img | deploy "
                  f"{t_dep*1e3/batch:.2f} ms/img", flush=True)

    print("\nper-conv microbench (3x3, ch->ch, chained):")
    for ch, size in ((32, 576), (64, 288), (128, 144), (256, 72),
                     (512, 36), (1024, 18)):
        per_conv, tflops = conv_chain_time(ch, size, 3)
        print(f"  ch={ch:5d} @{size}^2: {per_conv*1e6:8.1f} us/conv, "
              f"{tflops:6.1f} TFLOP/s", flush=True)

    if len(sys.argv) > 1 and sys.argv[1] == "trace":
        import glob
        import os
        cfg = DISYoloConfig(deploy=True)
        v = api.init_variables(cfg.replace(deploy=False), jax.random.PRNGKey(0))
        dv = deploy_variables(v)
        model = api.create_model(cfg)
        img = jnp.zeros((1, 576, 576, 3), jnp.float32)
        fn = jax.jit(lambda x: [r.sum() for r in
                                api.forward(model, dv, x, train=False)])
        jax.block_until_ready(fn(img))
        logdir = "/tmp/dis_yolo_trace"
        with jax.profiler.trace(logdir):
            for _ in range(3):
                jax.block_until_ready(fn(img))
        # parse the xplane and rank op self-times
        paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                                 recursive=True), key=os.path.getmtime)
        data = jax.profiler.ProfileData.from_file(paths[-1])
        tallies = {}
        for plane in data.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                for ev in line.events:
                    ns = ev.duration_ns
                    name = ev.name
                    tallies[name] = tallies.get(name, 0) + ns
        top = sorted(tallies.items(), key=lambda kv: -kv[1])[:40]
        total = sum(tallies.values())
        print(f"\ntrace op ranking (total {total/1e6:.2f} ms over 3 runs):")
        for name, ns in top:
            print(f"  {ns/1e6:9.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
