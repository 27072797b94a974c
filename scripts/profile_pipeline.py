"""Cumulative stage-split of the full inference pipeline on the real chip.

Chain-scan times progressively longer prefixes of the pipeline at 576^2:
  A forward only
  B + decode + NMS          (nms_engine fixpoint AND scan AND the
                             Pallas suppression-matrix kernel on TPU)
  C + mask assembly         (pallas AND jnp one-hot)
  D + paste to original     (current MXU engine)
Differences between consecutive prefixes attribute cost per stage honestly
(everything inside one jitted chain; no dispatch artifacts).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_pipeline.py [batch]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm
from dis_yolo_tpu.ops import mask_assembly, nms
from dis_yolo_tpu.ops.decode import decode_all
from dis_yolo_tpu.ops.paste import paste_masks_batch
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print(f"backend: {jax.default_backend()}, batch {batch}")

    cfg = DISYoloConfig()
    model = api.create_model(cfg)
    variables = fold_batchnorm(model, api.init_variables(cfg,
                                                         jax.random.PRNGKey(0)))
    size = cfg.image_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    windows = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (batch, 1))
    from dis_yolo_tpu.utils.runtime import calibrate_threshold
    thresh = calibrate_threshold(model, variables, img, cfg)
    print(f"calibrated obj_thresh = {thresh:.4f}", flush=True)

    def stage_a(x):
        raws = api.forward(model, variables, x, train=False)
        return sum(r.sum() for r in raws)

    def make_b(engine):
        # "pallas" = the fused suppression-matrix kernel (cfg.use_pallas_nms)
        c = (cfg.replace(use_pallas_nms=True) if engine == "pallas"
             else cfg.replace(nms_engine=engine))

        def stage_b(x):
            raws = api.forward(model, variables, x, train=False)
            preds = decode_all(raws[:3], c)
            dets = nms.filter_detections(preds, windows, c, thresh)
            return dets.sum() + raws[3].sum()
        return stage_b

    def make_c(pallas):
        def stage_c(x):
            raws = api.forward(model, variables, x, train=False)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            if pallas:
                from dis_yolo_tpu.ops.pallas_assembly import \
                    assemble_masks_batch_pallas
                masks = assemble_masks_batch_pallas(raws[3], dets[..., :4],
                                                    cfg.k_map)
            else:
                masks = mask_assembly.assemble_masks_batch(raws[3],
                                                           dets[..., :4],
                                                           cfg.k_map)
            return dets.sum() + masks.sum()
        return stage_c

    def stage_d(x):
        dets, masks = api.predict(model, variables, x, windows, thresh)
        full, valid, sem = paste_masks_batch(masks, dets, size, size, size)
        return (dets.sum() + full.sum() + valid.sum()
                + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
            + masks[0, 0, 0, 0]

    n = 60 if batch == 1 else 30
    t_a = chain_scan_time(stage_a, img, n=n)
    print(f"A forward                 : {t_a*1e3/batch:7.3f} ms/img", flush=True)
    engines = ("fixpoint", "scan") if jax.default_backend() in ("cpu", "gpu") \
        else ("fixpoint", "scan", "pallas")
    for engine in engines:
        t_b = chain_scan_time(make_b(engine), img, n=n)
        print(f"B +decode+NMS[{engine:8s}] : {t_b*1e3/batch:7.3f} ms/img "
              f"(stage {((t_b-t_a))*1e3/batch:+.3f})", flush=True)
    t_b = chain_scan_time(make_b(cfg.nms_engine), img, n=n)
    for pallas in (True, False):
        t_c = chain_scan_time(make_c(pallas), img, n=n)
        name = "pallas" if pallas else "jnp"
        print(f"C +assembly[{name:6s}]      : {t_c*1e3/batch:7.3f} ms/img "
              f"(stage {((t_c-t_b))*1e3/batch:+.3f})", flush=True)
    t_c = chain_scan_time(make_c(cfg.use_pallas_assembly), img, n=n)
    t_d = chain_scan_time(stage_d, img, n=n)
    print(f"D +paste                  : {t_d*1e3/batch:7.3f} ms/img "
          f"(stage {((t_d-t_c))*1e3/batch:+.3f})", flush=True)


if __name__ == "__main__":
    main()
