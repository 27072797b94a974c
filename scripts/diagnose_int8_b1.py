"""Diagnose the int8 batch-1 full-pipeline regression (VERDICT r2 #2).

Round-2 measurement: hybrid int8 forward is faster than bf16 (1.86 vs
2.0 ms) yet the FULL batch-1 pipeline is slower (~4.1 vs 3.36 ms).  This
script attributes the gap per stage with cumulative-prefix chain scans on
the int8 graph (mirroring scripts/profile_pipeline.py for the float one)
and tests the fusion-boundary hypothesis directly: if inserting
``jax.lax.optimization_barrier`` between the quant forward and the tail
recovers the time, the dequant epilogues were fusing into (and
serializing/bloating) the decode/NMS/assembly tail.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diagnose_int8_b1.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm, deploy_variables
from dis_yolo_tpu.models.quant import calibrate_deploy, quantize_deploy
from dis_yolo_tpu.ops import mask_assembly, nms
from dis_yolo_tpu.ops.decode import decode_all
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
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    dv = deploy_variables(v)
    img = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    windows = jnp.asarray([[0., 0., 1., 1.]], jnp.float32)

    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    qv = quantize_deploy(dv, calibrate_deploy(cmodel, dv, img))
    qmodel = api.create_model(cfg.replace(quant=True))
    fmodel = api.create_model(cfg)
    fv = fold_batchnorm(fmodel, v)
    thresh = calibrate_threshold(fmodel, fv, img, cfg)
    print(f"calibrated obj_thresh = {thresh:.4f}", flush=True)

    n = 40

    def run(name, body):
        t = chain_scan_time(body, img, n=n)
        print(f"{name:34s}: {t*1e3:7.3f} ms/img", flush=True)
        return t

    def prefixes(model, variables, tag, barrier=False):
        def fwd_raws(x):
            raws = api.forward(model, variables, x, train=False)
            if barrier:
                raws = jax.lax.optimization_barrier(tuple(raws))
            return raws

        def a(x):
            return sum(r.sum() for r in fwd_raws(x))

        def b(x):
            raws = fwd_raws(x)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            return dets.sum() + raws[3].sum()

        def c(x):
            raws = fwd_raws(x)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            from dis_yolo_tpu.ops.pallas_assembly import \
                assemble_masks_batch_pallas
            masks = assemble_masks_batch_pallas(raws[3], dets[..., :4],
                                                cfg.k_map)
            return dets.sum() + masks.sum()

        def d(x):
            raws = fwd_raws(x)
            dets, masks = api.predict_from_outputs(cfg, raws, windows, thresh)
            full, valid, sem = paste_masks_batch(masks, dets, size, size, size)
            return (dets.sum() + full.sum() + valid.sum()
                    + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
                + masks[0, 0, 0, 0]

        ta = run(f"{tag} A forward", a)
        tb = run(f"{tag} B +decode+NMS", b)
        tc = run(f"{tag} C +assembly", c)
        td = run(f"{tag} D +paste (full)", d)
        print(f"{tag} stages: NMS {+(tb-ta)*1e3:+.3f} asm {(tc-tb)*1e3:+.3f} "
              f"paste {(td-tc)*1e3:+.3f}", flush=True)
        return ta, tb, tc, td

    print("== float bf16 deploy ==")
    prefixes(fmodel, fv, "f32")
    print("== hybrid int8 ==")
    prefixes(qmodel, qv, "i8 ")
    print("== hybrid int8 + optimization_barrier after forward ==")
    prefixes(qmodel, qv, "i8b", barrier=True)


if __name__ == "__main__":
    main()
