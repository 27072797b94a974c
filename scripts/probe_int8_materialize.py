"""Isolate the int8 b1 assembly-stage cost: score-map materialization.

Stage B consumes raws[3] via a fused .sum() — the score maps are never
materialized.  Stage C must materialize them channels-first f32 for the
Pallas assembly operand.  These variants separate "materialize+transpose"
from "pallas kernel" and test operand-side fixes:

  mat      forward+NMS + materialized channels-first f32 score maps (no
           pallas) — the bare transpose/materialization cost
  mat_bf16 same but keep bf16 (half the relayout bytes)
  pal_bf16 full stage C with a bf16 pallas operand (cast inside kernel
           via the f32 read the kernel already does... here: cast outside
           removed, operand dtype bf16)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_materialize.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables, fold_batchnorm
from dis_yolo_tpu.models.quant import calibrate_deploy, quantize_deploy
from dis_yolo_tpu.ops import nms
from dis_yolo_tpu.ops.decode import decode_all
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    cfg = DISYoloConfig()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    windows = jnp.asarray([[0., 0., 1., 1.]], jnp.float32)

    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    fmodel = api.create_model(cfg)
    fv = fold_batchnorm(fmodel, v)
    dv = deploy_variables(v)
    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    qv = quantize_deploy(dv, calibrate_deploy(cmodel, dv, img))
    qmodel = api.create_model(cfg.replace(quant=True))
    thresh = calibrate_threshold(fmodel, fv, img, cfg)
    print(f"thresh {thresh:.4f}", flush=True)

    def base(model, variables, x):
        raws = api.forward(model, variables, x, train=False)
        preds = decode_all(raws[:3], cfg)
        dets = nms.filter_detections(preds, windows, cfg, thresh)
        return raws, dets

    def make_mat(model, variables, dtype):
        def f(x):
            raws, dets = base(model, variables, x)
            sm_cf = jnp.transpose(raws[3], (0, 3, 1, 2)).astype(dtype)
            sm_cf = jax.lax.optimization_barrier(sm_cf)   # force materialize
            return dets.sum() + sm_cf[0, 0, 0, 0].astype(jnp.float32)
        return f

    def make_pal(model, variables, barrier, f32_operand):
        from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_batch_pallas
        def f(x):
            raws, dets = base(model, variables, x)
            sm = raws[3].astype(jnp.float32) if f32_operand else raws[3]
            masks = assemble_masks_batch_pallas(sm, dets[..., :4], cfg.k_map,
                                                operand_barrier=barrier)
            return dets.sum() + masks.sum()
        return f

    runs = [
        ("i8   pallas old (f32, no bar)", make_pal(qmodel, qv, False, True)),
        ("i8   pallas bar f32", make_pal(qmodel, qv, True, True)),
        ("i8   pallas bar bf16", make_pal(qmodel, qv, True, False)),
        ("f32  pallas old", make_pal(fmodel, fv, False, True)),
        ("f32  pallas bar bf16", make_pal(fmodel, fv, True, False)),
    ]
    for name, fn in runs:
        t = chain_scan_time(fn, img, n=40)
        print(f"{name:16s}: {t*1e3:7.3f} ms/img", flush=True)


if __name__ == "__main__":
    main()
