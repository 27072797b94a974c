"""int8 deploy graph benchmark: forward + full pipeline vs float deploy.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_quant.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm, deploy_variables
from dis_yolo_tpu.models.quant import calibrate_deploy, quantize_deploy
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
    img1 = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))

    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    qv = quantize_deploy(dv, calibrate_deploy(cmodel, dv, img1))
    qmodel = api.create_model(cfg.replace(quant=True))
    fmodel = api.create_model(cfg)
    fv = fold_batchnorm(fmodel, v)
    thresh = calibrate_threshold(fmodel, fv, img1, cfg)
    print(f"calibrated obj_thresh = {thresh:.4f}")

    for batch in (1, 4, 8):
        img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        windows = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (batch, 1))

        def fwd(x):
            raws = api.forward(qmodel, qv, x, train=False)
            return sum(r.sum() for r in raws)

        def full(x):
            dets, masks = api.predict(qmodel, qv, x, windows, thresh)
            f, valid, sem = paste_masks_batch(masks, dets, size, size, size)
            return (dets.sum() + f.sum() + valid.sum()
                    + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
                + masks[0, 0, 0, 0]

        t_f = chain_scan_time(fwd, img, n=40 if batch == 1 else 20)
        t_p = chain_scan_time(full, img, n=40 if batch == 1 else 20)
        per = t_p / batch
        print(f"batch {batch}: int8 forward {t_f*1e3/batch:.3f} ms/img | "
              f"full pipeline {per*1e3:.3f} ms/img = {1/per:.0f} img/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
