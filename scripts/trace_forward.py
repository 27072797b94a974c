"""Op-level trace ranking of the folded-BN full forward (the bench graph).

Answers "where do the ~2 ms go at batch 1" with per-op self times:
MXU convs vs layout copies vs stem vs head reshapes.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/trace_forward.py [batch]
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
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = fold_batchnorm(model, api.init_variables(cfg,
                                                         jax.random.PRNGKey(0)))
    img = jnp.asarray(np.random.RandomState(0)
                      .rand(batch, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    fn = jax.jit(lambda x: [r.sum() for r in
                            api.forward(model, variables, x, train=False)])
    jax.block_until_ready(fn(img))
    logdir = "/tmp/dyt_trace_fwd"
    with jax.profiler.trace(logdir):
        for _ in range(3):
            jax.block_until_ready(fn(img))

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
    print(f"trace op ranking, batch {batch} "
          f"(total {total/1e6:.2f} ms over 3 runs):")
    grouped = {"conv/fusion": 0, "copy": 0, "other": 0}
    for name, ns in tallies.items():
        if name.startswith("%copy") or ".copy" in name:
            grouped["copy"] += ns
        elif "fusion" in name or "convolution" in name:
            grouped["conv/fusion"] += ns
        elif not name.startswith("jit_"):
            grouped["other"] += ns
    for g, ns in grouped.items():
        print(f"  group {g:12s}: {ns/3e6:7.3f} ms/run")
    for name, ns in sorted(tallies.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {ns/1e6:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
