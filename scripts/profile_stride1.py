"""Stage split for the stride-1 (S=576) accuracy-flagship pipeline.

Round 3 made stride-1 fast end to end (7.65 ms b1, tiled Pallas assembly)
but BENCHMARKS lacked a per-stage attribution of the +4.3 ms over the
stride-2 graph (3.38 ms).  Cumulative-prefix chain scans mirror
scripts/profile_pipeline.py: A forward, B +decode+NMS, C +assembly,
D +paste (full scope).  Also measures hybrid-int8 full scope at b1/b4 and
bf16 b4 so the serving table covers the flagship decoder.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stride1.py
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
    cfg = DISYoloConfig(mask_stride=1)
    size = cfg.image_size
    rng = np.random.RandomState(0)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    dv = deploy_variables(v)
    img = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    windows = jnp.asarray([[0., 0., 1., 1.]], jnp.float32)

    fmodel = api.create_model(cfg)
    fv = fold_batchnorm(fmodel, v)
    thresh = calibrate_threshold(fmodel, fv, img, cfg)
    print(f"thresh {thresh:.4f}", flush=True)

    out = {}

    def stage_a(x):
        raws = api.forward(fmodel, fv, x, train=False)
        return sum(r.sum() for r in raws[:3]) + raws[3][0, 0, 0]

    def stage_b(x):
        raws = api.forward(fmodel, fv, x, train=False)
        preds = decode_all(raws[:3], cfg)
        dets = nms.filter_detections(preds, windows, cfg, thresh)
        return dets.sum() + raws[3][0, 0, 0]

    def stage_c(x):
        raws = api.forward(fmodel, fv, x, train=False)
        preds = decode_all(raws[:3], cfg)
        dets = nms.filter_detections(preds, windows, cfg, thresh)
        masks = assemble_masks_batch_pallas(raws[3], dets[..., :4], cfg.k_map)
        return dets.sum() + masks.sum()

    def make_full(model, variables, wins):
        def f(x):
            dets, masks = api.predict(model, variables, x, wins, thresh)
            fl, valid, sem = paste_masks_batch(masks, dets, size, size, size)
            return (dets.sum() + fl.sum() + valid.sum()
                    + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
                + masks[0, 0, 0, 0]
        return f

    for name, body in (("A forward", stage_a), ("B +decode+NMS", stage_b),
                       ("C +assembly", stage_c),
                       ("D +paste (full)", make_full(fmodel, fv, windows))):
        t = chain_scan_time(body, img, n=40)
        print(f"bf16 {name:16s}: {t*1e3:7.3f} ms/img", flush=True)
        out[f"bf16_{name.split()[0]}_ms"] = round(t * 1e3, 3)

    # serving points: bf16 + hybrid int8 at b4 (throughput), int8 b1
    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    qv = quantize_deploy(dv, calibrate_deploy(cmodel, dv, img))
    qmodel = api.create_model(cfg.replace(quant=True))
    for batch in (1, 4):
        imgs = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        wins = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (batch, 1))
        for tag, model, variables in (("bf16", fmodel, fv),
                                      ("i8", qmodel, qv)):
            if batch == 1 and tag == "bf16":
                continue       # == stage D above
            t = chain_scan_time(make_full(model, variables, wins), imgs,
                                n=40 if batch == 1 else 20) / batch
            print(f"{tag:4s} full b{batch}: {t*1e3:7.3f} ms/img "
                  f"({1/t:5.0f} img/s)", flush=True)
            out[f"{tag}_full_b{batch}_ms"] = round(t * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
