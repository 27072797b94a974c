"""Benchmark the space-to-depth stem (models/s2d.py) on the real chip.

Chain-scan timed full forwards at 576^2: plain deploy graph vs s2d-stem
deploy graph, batch 1 and 4; plus the full predict pipeline (forward +
decode + NMS + assembly + paste) with the s2d graph.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_s2d.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables
from dis_yolo_tpu.models.s2d import s2d_stem_variables
from dis_yolo_tpu.ops.paste import paste_masks_batch
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def fwd_time(cfg, variables, batch, n=20):
    model = api.create_model(cfg)
    img = jnp.asarray(np.random.RandomState(0)
                      .rand(batch, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))

    def body(x):
        raws = api.forward(model, variables, x, train=False)
        return sum(r.sum() for r in raws)
    return chain_scan_time(body, img, n=n)


def full_time(cfg, variables, batch, n=20):
    model = api.create_model(cfg)
    size = cfg.image_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    windows = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (batch, 1))

    def body(x):
        dets, masks = api.predict(model, variables, x, windows,
                                  obj_thresh=1e-6)
        full, valid, sem = paste_masks_batch(masks, dets, size, size, size)
        return (dets.sum() + full.sum() + valid.sum()
                + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
            + masks[0, 0, 0, 0]
    return chain_scan_time(body, img, n=n)


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    cfg = DISYoloConfig()
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    dv = deploy_variables(v)
    sv = s2d_stem_variables(dv)
    dcfg = cfg.replace(deploy=True)
    scfg = dcfg.replace(s2d_stem=True)

    for batch in (1, 4):
        t_d = fwd_time(dcfg, dv, batch, n=60)
        t_s = fwd_time(scfg, sv, batch, n=60)
        speed = t_d / t_s if t_s > 0 else float("inf")
        print(f"forward 576 b{batch}: deploy {t_d*1e3/batch:.3f} ms/img | "
              f"s2d {t_s*1e3/batch:.3f} ms/img ({speed:.2f}x)", flush=True)

    for batch in (1, 4, 8):
        t = full_time(scfg, sv, batch, n=40)
        per = t / batch if t > 0 else float("nan")
        print(f"full pipeline (s2d) 576 b{batch}: {per*1e3:.3f} ms/img = "
              f"{1.0/per:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
