"""Test the scoped-VMEM-pressure hypothesis for the int8 b1 regression.

Neither fusion boundaries (optimization_barrier), operand layout/dtype,
nor which convs are int8 explain the +1.4 ms (earlier probes).  Remaining
suspect: the resident assembly kernel's scoped-VMEM appetite (~13 MB at
S=288: 3 MB score maps + 2 double-buffered 15-box output blocks).  XLA
budgets scoped VMEM program-wide; int8 conv fusions (dequant epilogues,
s32 accumulators) need more VMEM than bf16 ones, and the trace shows them
degrading to T(1,128) tilings only in the stage-C graph.  If shrinking
the kernel's blocks (fewer boxes per program) recovers the conv time, the
fix is a smaller default block budget.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_vmem.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables, fold_batchnorm
from dis_yolo_tpu.models.quant import calibrate_deploy, quantize_deploy
from dis_yolo_tpu.ops import nms, pallas_assembly
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

    def make_c(model, variables):
        def f(x):
            raws = api.forward(model, variables, x, train=False)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            masks = pallas_assembly.assemble_masks_batch_pallas(
                raws[3], dets[..., :4], cfg.k_map)
            return dets.sum() + masks.sum()
        return f

    orig = pallas_assembly._boxes_per_program
    for bpp in (15, 5, 3, 1):
        pallas_assembly._boxes_per_program = lambda d, s, k, _b=bpp: _b
        # new jit cache key per variant: clear the wrapper's cache
        pallas_assembly.assemble_masks_pallas.clear_cache()
        for tag, model, variables in (("i8 ", qmodel, qv),
                                      ("f32", fmodel, fv)):
            t = chain_scan_time(make_c(model, variables), img, n=40)
            print(f"{tag} stage C, bpp={bpp:2d}: {t*1e3:7.3f} ms/img",
                  flush=True)
    pallas_assembly._boxes_per_program = orig


if __name__ == "__main__":
    main()
