"""Headline benchmark: single-image end-to-end inference latency at 576x576.

Reference baseline: ~0.1 s/image (i7-7700 + GTX 1060, batch 1, timed as
device predict + host mask crop/resize/binarize/paste to original
resolution — README.md:23, calculate_test_map.py:246-257,:301-302).  Here
the *entire* pipeline (backbone, heads, decode, NMS, position-sensitive
mask assembly, sigmoid, AND the crop/resize/binarize/paste stage that the
reference runs on host) executes on-device in one jitted program, pasting
into a 576x576 original-resolution canvas (apples-to-apples with the
reference's timed scope; `device_only_s_per_image` reports the pre-paste
subset for continuity with round 1).

Methodology: N inference steps are chained inside one `lax.scan` with a
data dependence between iterations, and a scalar reduced from every step's
output is fetched to host — so the measured wall time provably contains N
full executions (plain dispatch loops under-report on remote-attached
devices: unconsumed outputs can be elided, and `block_until_ready` over a
tunnel measures dispatch, not compute).  Per-image time is the two-point
slope between a 20- and a 60-long chain, which cancels the *fixed*
per-fetch cost (tunnel RTT + host sync, 50-75 ms here) instead of smearing
it into every step — matching the reference's amortized loop-over-images
timing.  The detection threshold is *calibrated*: picked as the 200th
highest candidate score of this net on this input, so ~200 candidates
enter NMS and all 30 detection slots flow through assembly + paste with
real work — the regime a trained net at the reference's 0.25 threshold
operates in (a threshold of ~0 would instead declare all ~20k anchors
valid, a pathological NMS load no trained detector produces; a high one
would let all-padding outputs flatter the masking paths).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s/image", "vs_baseline": N}
vs_baseline > 1 means faster than the reference.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_IMAGE = 0.1
# chain lengths sized so the 40->120-step slope dwarfs per-fetch jitter
# (tunnel fetch variance ~ +/-20 ms; 80 extra steps x ~3 ms >> that —
# at n=20 a lucky fetch once reported the full scope "faster" than its
# own device-only subset)
N_CHAIN = 40
N_REPEATS = 5


def main() -> None:
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.models.fold import fold_batchnorm
    from dis_yolo_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()   # repeat runs skip the multi-minute compile

    # decoder_commute: exact-algebra decoder fusion (1x1 before upsample),
    # measured 1.985 -> 1.908 ms forward at 576^2 (BENCHMARKS round 5)
    cfg = DISYoloConfig(decoder_commute=True)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    variables = fold_batchnorm(model, variables)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)

    from dis_yolo_tpu.ops.paste import paste_masks_batch
    from dis_yolo_tpu.utils.profiling import chain_scan_time
    from dis_yolo_tpu.utils.runtime import calibrate_threshold
    size = cfg.image_size

    obj_thresh = calibrate_threshold(model, variables, images, cfg)

    def body_device_only(carry):
        dets, masks = api.predict(model, variables, carry, windows,
                                  obj_thresh=obj_thresh)
        return dets.sum() + masks[0, 0, 0, 0]

    def body_full(carry):
        dets, masks = api.predict(model, variables, carry, windows,
                                  obj_thresh=obj_thresh)
        full, valid, sem = paste_masks_batch(masks, dets, size, size, size)
        return (dets.sum() + full.sum() + sem.astype(jnp.int32).sum()
                + valid.sum()).astype(jnp.float32) + masks[0, 0, 0, 0]

    dt_dev = chain_scan_time(body_device_only, images, n=N_CHAIN,
                             repeats=N_REPEATS)
    dt_full = chain_scan_time(body_full, images, n=N_CHAIN,
                              repeats=N_REPEATS)

    print(json.dumps({
        "metric": "e2e_inference_latency_576_batch1",
        "value": round(dt_full, 6),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_S_PER_IMAGE / dt_full, 2),
        "device_only_s_per_image": round(dt_dev, 6),
        "scope": "forward+decode+NMS+assembly+sigmoid+paste-to-original"
                 " (reference timed scope, calculate_test_map.py:301-302)",
    }))


if __name__ == "__main__":
    main()
