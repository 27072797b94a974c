"""Probe: how should the assembly kernel's channels-first operand be made?

The assembly stage attribution (+0.69 ms f32 / +1.63 ms int8 at b1) is
dominated by producing the [k^2, S, S] operand from the head's NHWC
[S, S, k^2] output, not by the kernel (51 us isolated).  Candidate
explanations and their probes:

  * ``transpose``  — XLA transpose of the 9-channel array (round-2
    default).  The 9-wide minor dim is lane-padded (8,128)-tiles, so XLA
    lowers this relayout poorly; the int8 graph additionally drags an s32
    conv fusion into a degenerate T(1,128) layout (trace_int8_tail.py).
  * ``extract``    — the round-3 MXU one-hot extraction kernel.  Its
    premise (the [S, S*k^2] reshape is free) is wrong on TPU: minor-dim
    tiling makes that reshape a physical re-tiling, so it measured
    *slower* (f32 stage C 3.07 vs 2.94; int8 4.13 vs 3.66).
  * ``padN``       — pad the channel dim to a tile-friendly width (16 /
    128) BEFORE the transpose, transpose the padded array (tile-aligned
    relayout), feed the padded [N, S, S] straight into the kernel (it
    only reads planes < k^2).  If the degenerate-layout lowering is the
    cost, an aligned relayout should run at HBM speed (~10s of us).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_operand_layout.py
"""

from __future__ import annotations

import functools
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
from dis_yolo_tpu.ops.pallas_assembly import (_call_assembly, _extract_planes,
                                              fits_vmem)
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def make_operand(sm: jnp.ndarray, variant: str, k: int) -> jnp.ndarray:
    """[S, S, k^2] -> [>=k^2, S, S] channels-first planes, per variant."""
    size = sm.shape[0]
    if variant == "transpose":
        return jnp.transpose(sm, (2, 0, 1)).astype(jnp.float32)
    if variant == "extract":
        return _extract_planes(sm.reshape(size, size * k * k), k, False)
    if variant.startswith("pad"):
        n = int(variant[3:])
        smp = jnp.pad(sm, ((0, 0), (0, 0), (0, n - k * k)))
        return jnp.transpose(smp, (2, 0, 1)).astype(jnp.float32)
    raise ValueError(variant)


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    cfg = DISYoloConfig()
    size = cfg.image_size
    k = cfg.k_map
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
    assert fits_vmem(size // 2, k)

    def make_c(model, variables, variant):
        def assemble_one(sm, boxes_norm):
            sm_cf = make_operand(sm, variant, k)
            boxes_px = jnp.round(boxes_norm.astype(jnp.float32) * sm.shape[0])
            return _call_assembly(sm_cf, boxes_px, k, True, False)

        def f(x):
            raws = api.forward(model, variables, x, train=False)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            masks = jax.vmap(assemble_one)(raws[3], dets[..., :4])
            return dets.sum() + masks.sum()
        return f

    out = {}
    for tag, model, variables in (("f32", fmodel, fv), ("i8", qmodel, qv)):
        for variant in ("transpose", "pad16", "pad128", "extract"):
            t = chain_scan_time(make_c(model, variables, variant), img, n=40)
            print(f"{tag:3s} stage C [{variant:9s}]: {t*1e3:7.3f} ms/img",
                  flush=True)
            out[f"{tag}_{variant}_ms"] = round(t * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
