"""Stride-1 (S=576) assembly + full-pipeline latency on the real TPU.

The stride-1 85-layer decoder (yolo3_net_pos.py:415-461 commented variant,
``DISYoloConfig(mask_stride=1)``) is the accuracy-best config (synthetic
mAP 0.809 vs 0.67 at stride 2 — BENCHMARKS.md) but its S=576 score maps
exceed the VMEM-resident kernel budget; round 3 adds a spatially-tiled
layout.  This script records, with the chain-scan method (the only honest
timing on this tunneled chip — see CLAUDE.md):

  1. isolated assembly at S=576, D=30: jnp gather vs tiled Pallas kernel
  2. full pipeline (forward -> decode -> NMS -> assembly -> sigmoid ->
     paste) at stride 1, batch 1, calibrated threshold — the missing
     BENCHMARKS.md row for the accuracy flagship.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stride1.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.models.fold import fold_batchnorm
    from dis_yolo_tpu.ops import mask_assembly
    from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_pallas, fits_vmem
    from dis_yolo_tpu.ops.paste import paste_masks_batch
    from dis_yolo_tpu.utils.profiling import chain_scan_time
    from dis_yolo_tpu.utils.runtime import calibrate_threshold, enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())

    S, k, D = 576, 3, 30
    rng = np.random.RandomState(0)
    sm = jnp.asarray(rng.randn(S, S, k * k).astype(np.float32))
    b = rng.uniform(0, 1, (D, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])],
                     axis=1)
    boxes = jnp.asarray(boxes)
    assert not fits_vmem(S, k), "expected S=576 to exceed the resident budget"

    # correctness on-chip first: tiled kernel vs jnp gather, compiled
    want = np.asarray(mask_assembly.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=False))
    np.testing.assert_array_equal(got, want)
    print("on-chip bit parity at S=576: OK")

    def body_jnp(carry):
        return mask_assembly.assemble_masks(carry, boxes, k)

    def body_pallas(carry):
        return assemble_masks_pallas(carry, boxes, k, apply_sigmoid=False)

    t_jnp = chain_scan_time(body_jnp, sm, n=10, repeats=3)
    print(f"assembly jnp gather   S=576 D=30: {t_jnp*1e3:.3f} ms")
    t_pal = chain_scan_time(body_pallas, sm, n=20, repeats=3)
    print(f"assembly tiled Pallas S=576 D=30: {t_pal*1e3:.3f} ms "
          f"({t_jnp/t_pal:.1f}x)")

    # ---- full stride-1 pipeline, batch 1 ----
    cfg = DISYoloConfig(mask_stride=1)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    variables = fold_batchnorm(model, variables)
    images = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                         .astype(np.float32))
    windows = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)
    obj_thresh = calibrate_threshold(model, variables, images, cfg)
    size = cfg.image_size

    def body_full(carry):
        dets, masks = api.predict(model, variables, carry, windows,
                                  obj_thresh=obj_thresh)
        full, valid, sem = paste_masks_batch(masks, dets, size, size, size)
        return (dets.sum() + full.sum() + sem.astype(jnp.int32).sum()
                + valid.sum()).astype(jnp.float32) + masks[0, 0, 0, 0]

    t_full = chain_scan_time(body_full, images, n=20, repeats=3)
    print(f"stride-1 full pipeline 576^2 b1: {t_full*1e3:.3f} ms "
          f"({0.1/t_full:.1f}x baseline)")

    print(json.dumps({
        "assembly_jnp_s576_ms": round(t_jnp * 1e3, 3),
        "assembly_tiled_pallas_s576_ms": round(t_pal * 1e3, 3),
        "stride1_full_pipeline_b1_ms": round(t_full * 1e3, 3),
        "vs_baseline": round(0.1 / t_full, 1),
    }))


if __name__ == "__main__":
    main()
