"""Serving throughput sweep: full inference pipeline vs batch size.

Full scope per image (reference-timed scope): forward + decode + NMS +
mask assembly + sigmoid + paste-to-original-576.  Slope-timed
(utils/profiling.chain_scan_time).  Folded-BN weights (the fastest
batch-1 graph per scripts/profile_forward.py).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_serving.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm
from dis_yolo_tpu.ops.paste import paste_masks_batch
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = fold_batchnorm(model, api.init_variables(cfg,
                                                         jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)
    size = cfg.image_size
    img1 = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    thresh = calibrate_threshold(model, variables, img1, cfg)
    print(f"calibrated obj_thresh = {thresh:.4f}")

    results = {}
    for batch in (1, 4, 8):
        images = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        windows = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (batch, 1))

        def body(carry):
            dets, masks = api.predict(model, variables, carry, windows,
                                      obj_thresh=thresh)
            full, valid, sem = paste_masks_batch(masks, dets, size, size,
                                                 size)
            return (dets.sum() + full.sum() + valid.sum()
                    + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
                + masks[0, 0, 0, 0]

        t = chain_scan_time(body, images, n=20)
        per_img = t / batch
        results[batch] = per_img
        print(f"batch {batch}: {per_img*1e3:.2f} ms/img = "
              f"{1.0/per_img:.0f} img/s/chip", flush=True)

    print(json.dumps({f"batch{b}_s_per_image": round(v, 6)
                      for b, v in results.items()}))


if __name__ == "__main__":
    main()
