"""Test the int8 b1 fix: exclude the 288^2 decoder convs from the int8 set.

Trace evidence (scripts/trace_int8_tail.py): the b1 regression is layout
poison — the Pallas assembly operand's channels-first layout propagates
backward through the float conv82 into the int8 conv80/81 fusions at
288^2, which then emit s32 outputs in a degenerate T(1,128) tiling
(+1.03 ms and +0.21 ms ops that do not exist in the float graph).
Keeping those convs bf16 (like the conv1-4 stem, same rationale: low
channels at high resolution) should restore the float graph's fusion
pattern around the score-map head while keeping the int8 win everywhere
the MXU double-rate path matters.

Measures full-pipeline chain-scan time at b1 / b4 / b8 for:
  * hybrid int8, default layer set   (5..85)
  * hybrid int8, tail-safe layer set (5..79)
  * bf16 float reference

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_quant_tail_fix.py
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

    fmodel = api.create_model(cfg)
    fv = fold_batchnorm(fmodel, v)
    thresh = calibrate_threshold(fmodel, fv, img1, cfg)
    print(f"calibrated obj_thresh = {thresh:.4f}", flush=True)

    def full_fn(model, variables, windows):
        def full(x):
            dets, masks = api.predict(model, variables, x, windows, thresh)
            f, valid, sem = paste_masks_batch(masks, dets, size, size, size)
            return (dets.sum() + f.sum() + valid.sum()
                    + sem.astype(jnp.int32).sum()).astype(jnp.float32) \
                + masks[0, 0, 0, 0]
        return full

    variants = {"bf16": (fmodel, fv)}
    for name, layers in (("int8_default", tuple(range(5, 86))),
                         ("int8_tailsafe", tuple(range(5, 80)))):
        qcfg = cfg.replace(quant=True, quant_layers=layers)
        cmodel = api.create_model(qcfg.replace(quant_calibrate=True))
        qv = quantize_deploy(dv, calibrate_deploy(cmodel, dv, img1))
        variants[name] = (api.create_model(qcfg), qv)

    out = {}
    for batch in (1, 4, 8):
        img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        windows = jnp.tile(jnp.asarray([0., 0., 1., 1.]), (batch, 1))
        for name, (model, variables) in variants.items():
            n = 40 if batch == 1 else 20
            t = chain_scan_time(full_fn(model, variables, windows), img, n=n)
            per = t / batch
            out[f"b{batch}_{name}"] = round(per * 1e3, 3)
            print(f"batch {batch} {name:13s}: {per*1e3:7.3f} ms/img "
                  f"({1/per:5.0f} img/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
