"""Op-level trace of the predict+paste graph: rank where the ~3 ms goes.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/trace_paste.py [paste-only]
"""

from __future__ import annotations

import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm
from dis_yolo_tpu.ops.paste import paste_masks_batch
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def rank(logdir, top=35):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_file(paths[-1])
    tallies = {}
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                tallies[ev.name] = tallies.get(ev.name, 0) + ev.duration_ns
    total = sum(tallies.values())
    print(f"\ntrace op ranking (total {total/1e6:.2f} ms over 3 runs):")
    for name, ns in sorted(tallies.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ns/1e6:9.3f} ms  {name[:110]}")


def main():
    enable_compilation_cache()
    paste_only = len(sys.argv) > 1 and sys.argv[1] == "paste-only"
    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = fold_batchnorm(model, api.init_variables(cfg,
                                                         jax.random.PRNGKey(0)))
    size = cfg.image_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    windows = jnp.asarray([[0., 0., 1., 1.]], jnp.float32)
    thresh = calibrate_threshold(model, variables, img, cfg)
    print(f"calibrated obj_thresh = {thresh:.4f}")

    if paste_only:
        dets, masks = jax.jit(lambda x: api.predict(model, variables, x,
                                                    windows, thresh))(img)
        dets, masks = jax.block_until_ready((dets, masks))
        fn = jax.jit(lambda m, d: paste_masks_batch(m, d, size, size, size))
        jax.block_until_ready(fn(masks, dets))
        with jax.profiler.trace("/tmp/dyt_trace_paste"):
            for _ in range(3):
                jax.block_until_ready(fn(masks, dets))
        rank("/tmp/dyt_trace_paste")
        return

    def body(x):
        dets, masks = api.predict(model, variables, x, windows, thresh)
        full, valid, sem = paste_masks_batch(masks, dets, size, size, size)
        return dets.sum(), full.sum(), valid.sum(), sem.astype(jnp.int32).sum()

    fn = jax.jit(body)
    jax.block_until_ready(fn(img))
    with jax.profiler.trace("/tmp/dyt_trace_full"):
        for _ in range(3):
            jax.block_until_ready(fn(img))
    rank("/tmp/dyt_trace_full")


if __name__ == "__main__":
    main()
