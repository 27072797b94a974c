"""Headline benchmark: single-image end-to-end inference latency at 576x576.

Reference baseline: ~0.1 s/image (i7-7700 + GTX 1060, batch 1, timed as
device predict + host mask crop/assemble — README.md:23,
calculate_test_map.py:301-302).  Here the *entire* pipeline (backbone,
heads, decode, NMS, position-sensitive mask assembly, sigmoid) runs
on-device in one jitted program.

Methodology: N inference steps are chained inside one `lax.scan` with a
data dependence between iterations, and a scalar reduced from every step's
output is fetched to host — so the measured wall time provably contains N
full executions (plain dispatch loops under-report on remote-attached
devices: unconsumed outputs can be elided, and `block_until_ready` over a
tunnel measures dispatch, not compute).  The detection threshold is set so
real detections flow through NMS + mask assembly (all-padding outputs would
flatter the gather paths).

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
N_CHAIN = 20


def main() -> None:
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.models.fold import fold_batchnorm
    from dis_yolo_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()   # repeat runs skip the multi-minute compile

    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    variables = fold_batchnorm(model, variables)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)

    def step(carry, _):
        dets, masks = api.predict(model, variables, carry, windows,
                                  obj_thresh=1e-6)
        carry = carry + (dets.sum() + masks[0, 0, 0, 0]) * 1e-20
        return carry, dets.sum()

    @jax.jit
    def chain(img):
        _, outs = jax.lax.scan(step, img, None, length=N_CHAIN)
        return outs.sum()

    float(chain(images))          # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(images))      # host fetch forces all N executions
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / N_CHAIN

    print(json.dumps({
        "metric": "e2e_inference_latency_576_batch1",
        "value": round(dt, 6),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_S_PER_IMAGE / dt, 2),
    }))


if __name__ == "__main__":
    main()
