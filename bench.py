"""Headline benchmark: single-image end-to-end inference latency at 576x576.

Reference baseline: ~0.1 s/image (i7-7700 + GTX 1060, batch 1, timed as
device predict + host mask crop/assemble — README.md:23,
calculate_test_map.py:301-302).  Here the *entire* pipeline (backbone,
heads, decode, NMS, mask assembly, sigmoid) runs on-device in one jitted
call; the timed unit is the same work per image.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s/image", "vs_baseline": N}
vs_baseline > 1 means faster than the reference.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_IMAGE = 0.1


def main() -> None:
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.models.fold import fold_batchnorm

    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    try:
        variables = fold_batchnorm(model, variables)
    except Exception:
        pass  # fall back to unfused BN if folding unavailable

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)

    run = api.make_jitted_predict(model)
    # warmup / compile
    out = run(variables, images, windows)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(variables, images, windows)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "e2e_inference_latency_576_batch1",
        "value": round(dt, 6),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_S_PER_IMAGE / dt, 2),
    }))


if __name__ == "__main__":
    main()
