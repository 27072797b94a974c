"""Probe: do f32-stored params cost a per-call convert in the forward?

The serving graphs store params in f32 while computing in bf16; Flax casts
kernels to the compute dtype inside every call.  Under jit the params are
arguments, so the convert executes every forward: ~246 MB of f32 reads +
~123 MB of bf16 writes for the 61.66 M-param net — ~0.4 ms of pure HBM
traffic at v5e bandwidth.  Measure forward chain time with (a) f32 params
(status quo) vs (b) kernels pre-cast to bf16 once at load.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/probe_bf16_params.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def cast_kernels_bf16(variables):
    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree_util.tree_map_with_path(cast, variables)


def main() -> None:
    enable_compilation_cache()
    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    variables = fold_batchnorm(model, variables)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)
    obj_thresh = calibrate_threshold(model, variables, images, cfg)

    def make_body(vs):
        def body(carry):
            dets, masks = api.predict(model, vs, carry, windows,
                                      obj_thresh=obj_thresh)
            return dets.sum() + masks[0, 0, 0, 0]
        return body

    t_f32 = chain_scan_time(make_body(variables), images, n=40, repeats=5)
    vb = cast_kernels_bf16(variables)
    t_bf16 = chain_scan_time(make_body(vb), images, n=40, repeats=5)
    print(f"forward+decode+NMS+assembly  f32 params : {t_f32*1e3:.3f} ms")
    print(f"forward+decode+NMS+assembly  bf16 params: {t_bf16*1e3:.3f} ms")
    print(f"delta: {(t_f32 - t_bf16)*1e3:+.3f} ms "
          f"({t_f32/t_bf16:.3f}x)")


if __name__ == "__main__":
    main()
