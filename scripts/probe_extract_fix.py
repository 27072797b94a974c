"""Measure the MXU extraction-kernel fix: stage C + full pipeline, b1.

Compares the bf16 and hybrid-int8 graphs after replacing the assembly
operand transpose with the channel-plane extraction kernel
(ops/pallas_assembly._extract_kernel).  Expected if the diagnosis holds:
stage C drops toward stage B for both graphs (float -0.5 ms, int8
-1.4 ms) and int8 b1 full pipeline goes below bf16's.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_extract_fix.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables, fold_batchnorm
from dis_yolo_tpu.models.quant import calibrate_deploy, quantize_deploy
from dis_yolo_tpu.ops import nms
from dis_yolo_tpu.ops.decode import decode_all
from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_batch_pallas
from dis_yolo_tpu.ops.paste import paste_masks_batch
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    cfg = DISYoloConfig()
    size = cfg.image_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
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

    def make_c(model, variables):
        def f(x):
            raws = api.forward(model, variables, x, train=False)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            masks = assemble_masks_batch_pallas(raws[3], dets[..., :4],
                                                cfg.k_map)
            return dets.sum() + masks.sum()
        return f

    def make_full(model, variables):
        def f(x):
            dets, masks = api.predict(model, variables, x, windows, thresh)
            fl, valid, sem = paste_masks_batch(masks, dets, size, size, size)
            return (dets.sum() + fl.sum() + valid.sum()
                    + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
                + masks[0, 0, 0, 0]
        return f

    out = {}
    for tag, model, variables in (("f32", fmodel, fv), ("i8", qmodel, qv)):
        t_c = chain_scan_time(make_c(model, variables), img, n=40)
        print(f"{tag} stage C (extract) : {t_c*1e3:7.3f} ms/img", flush=True)
        t_d = chain_scan_time(make_full(model, variables), img, n=40)
        print(f"{tag} full b1 (extract) : {t_d*1e3:7.3f} ms/img", flush=True)
        out[f"{tag}_stage_c_ms"] = round(t_c * 1e3, 3)
        out[f"{tag}_full_b1_ms"] = round(t_d * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
