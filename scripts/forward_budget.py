"""Itemized forward time budget (VERDICT r3 next #4).

The 2.02 ms bf16 forward runs at 36% MFU while individual big convs hit
146-196 TFLOP/s; this attributes the whole graph into named buckets by
chain-scan timing *truncated* programs (DISYolo.stop_stage) and taking
cumulative differences — the same honest methodology as the pipeline
stage split (no microbench layout lies, no profiler attribution guesses):

  stem      conv1-2            576^2/288^2, 32/64ch   (the low-MFU band)
  c128      conv3-9            288^2/144^2, 64/128ch
  c256      conv10-26          144^2/72^2, 256ch
  c512      conv27-43          72^2/36^2, 512ch
  backbone  conv44-52          36^2/18^2, 1024ch
  heads     conv53-75 (+FPN)   18/36/72^2
  decoder   conv76-82/85       144^2/288^2(/576^2) mask score maps

Each bucket row also reports its theoretical bf16 FLOPs and the implied
TFLOP/s, so the non-peak buckets are explicit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/forward_budget.py \
          [--batch 1] [--size 576] [--stride 2]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.dis_yolo import DISYolo
from dis_yolo_tpu.models.fold import fold_batchnorm
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache

STAGES = ("stem", "c128", "c256", "c512", "backbone", "heads", None)
NAMES = ("stem", "c128", "c256", "c512", "backbone", "heads", "decoder")


def conv_flops(cin, cout, k, hw):
    return 2 * cin * cout * k * k * hw * hw


def bucket_flops(size: int, stride: int):
    """Theoretical MACs*2 per bucket at input `size` (stride-2 decoder)."""
    s = size
    stem = conv_flops(3, 32, 3, s) + conv_flops(32, 64, 3, s // 2)
    c128 = (conv_flops(64, 32, 1, s // 2) + conv_flops(32, 64, 3, s // 2)
            + conv_flops(64, 128, 3, s // 4)
            + 2 * (conv_flops(128, 64, 1, s // 4) + conv_flops(64, 128, 3, s // 4)))
    c256 = (conv_flops(128, 256, 3, s // 8)
            + 8 * (conv_flops(256, 128, 1, s // 8) + conv_flops(128, 256, 3, s // 8)))
    c512 = (conv_flops(256, 512, 3, s // 16)
            + 8 * (conv_flops(512, 256, 1, s // 16) + conv_flops(256, 512, 3, s // 16)))
    backbone = (conv_flops(512, 1024, 3, s // 32)
                + 4 * (conv_flops(1024, 512, 1, s // 32) + conv_flops(512, 1024, 3, s // 32)))
    heads = (  # tower 1 (18^2)
        2 * (conv_flops(1024, 512, 1, s // 32) + conv_flops(512, 1024, 3, s // 32))
        + conv_flops(1024, 512, 1, s // 32) + conv_flops(512, 1024, 3, s // 32)
        + conv_flops(1024, 24, 1, s // 32)
        # tower 2 (36^2): in 512+256=768 after concat
        + conv_flops(512, 256, 1, s // 32)
        + conv_flops(768, 256, 1, s // 16) + 2 * conv_flops(256, 512, 3, s // 16)
        + 2 * conv_flops(512, 256, 1, s // 16) + conv_flops(512, 24, 1, s // 16)
        # tower 3 (72^2): in 256+128=384
        + conv_flops(256, 128, 1, s // 16)
        + conv_flops(384, 128, 1, s // 8) + 2 * conv_flops(128, 256, 3, s // 8)
        + 2 * conv_flops(256, 128, 1, s // 8) + conv_flops(256, 24, 1, s // 8))
    decoder = (conv_flops(128, 64, 1, s // 8)
               + conv_flops(64 + 128, 64, 1, s // 4) + conv_flops(64, 128, 3, s // 4))
    if stride == 4:
        decoder += conv_flops(128, 9, 1, s // 4)
    else:
        decoder += (conv_flops(128, 32, 1, s // 4)
                    + conv_flops(32 + 64, 32, 1, s // 2) + conv_flops(32, 64, 3, s // 2))
        if stride == 2:
            decoder += conv_flops(64, 9, 1, s // 2)
        else:
            decoder += (conv_flops(64, 16, 1, s // 2)
                        + conv_flops(16 + 32, 16, 1, s) + conv_flops(16, 32, 3, s)
                        + conv_flops(32, 9, 1, s))
    return dict(zip(NAMES, (stem, c128, c256, c512, backbone, heads, decoder)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--n", type=int, default=40)
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")

    cfg = DISYoloConfig(image_size=args.size, test_size=args.size,
                        mask_stride=args.stride)
    variables = fold_batchnorm(api.create_model(cfg),
                               api.init_variables(cfg, jax.random.PRNGKey(0)))
    img = jnp.asarray(np.random.RandomState(0)
                      .rand(args.batch, args.size, args.size, 3)
                      .astype(np.float32))

    cum = []
    for st in STAGES:
        model = DISYolo(cfg, stop_stage=st)

        def fn(x, model=model):
            outs = model.apply(variables, x, train=False)
            # scalar folded back into the chained input: data dependence
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        t = chain_scan_time(lambda x: x * 0 + fn(img + x * 1e-12),
                            jnp.zeros(()), n=args.n)
        cum.append(t)
        print(f"cumulative through {st or 'decoder'}: {t*1e3:8.3f} ms")

    flops = bucket_flops(args.size, args.stride)
    rows = {}
    prev = 0.0
    for name, t in zip(NAMES, cum):
        dt = t - prev
        prev = t
        fl = flops[name] * args.batch
        rows[name] = {"ms": round(dt * 1e3, 3),
                      "gflops": round(fl / 1e9, 1),
                      "tflops_per_s": round(fl / max(dt, 1e-9) / 1e12, 1)}
    total = cum[-1]
    print(json.dumps({"batch": args.batch, "size": args.size,
                      "stride": args.stride,
                      "total_ms": round(total * 1e3, 3),
                      "buckets": rows}, indent=1))


if __name__ == "__main__":
    main()
