"""Op-level trace diff of the assembly-stage cost: float vs int8 producer.

The stage-split diagnosis (scripts/diagnose_int8_b1.py) shows the int8
batch-1 regression lives entirely in the +assembly attribution (+1.63 ms
vs +0.69 float) and an optimization barrier after the forward does NOT
recover it.  This traces the full stage-C graph (forward -> decode -> NMS
-> Pallas assembly) for both producers and ranks ops, so the extra op(s)
show up by name.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_int8_tail.py
"""

from __future__ import annotations

import glob
import os

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
from dis_yolo_tpu.utils.runtime import (calibrate_threshold,
                                        enable_compilation_cache)


def rank_ops(tag: str, fn, img, top: int = 25):
    jax.block_until_ready(fn(img))
    logdir = f"/tmp/dyt_trace_{tag}"
    with jax.profiler.trace(logdir):
        for _ in range(3):
            jax.block_until_ready(fn(img))
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_file(paths[-1])
    tallies = {}
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                tallies[ev.name] = tallies.get(ev.name, 0) + ev.duration_ns
    total = sum(tallies.values())
    print(f"\n== {tag}: total {total/3e6:.3f} ms/run ==")
    for name, ns in sorted(tallies.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ns/3e6:9.3f} ms  {name[:110]}", flush=True)
    return tallies


def main():
    enable_compilation_cache()
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

    def make_stage_c(model, variables):
        @jax.jit
        def f(x):
            raws = api.forward(model, variables, x, train=False)
            preds = decode_all(raws[:3], cfg)
            dets = nms.filter_detections(preds, windows, cfg, thresh)
            masks = assemble_masks_batch_pallas(raws[3], dets[..., :4],
                                                cfg.k_map)
            return dets.sum() + masks.sum()
        return f

    t_f = rank_ops("float_c", make_stage_c(fmodel, fv), img)
    t_q = rank_ops("int8_c", make_stage_c(qmodel, qv), img)

    # ops that grew most int8-vs-float (by name; fusion names differ, so
    # also print int8-only ops)
    print("\n== int8-only or grown ops (>50us delta) ==")
    for name, ns in sorted(t_q.items(), key=lambda kv: -kv[1]):
        d = ns - t_f.get(name, 0)
        if d > 150_000:   # 50us/run * 3
            print(f"  +{d/3e6:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
