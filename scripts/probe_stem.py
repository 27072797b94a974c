"""Stem attack probes (VERDICT r3 next #4 follow-through).

The forward budget (scripts/forward_budget.py) attributes 0.827 ms of the
1.95 ms bf16 forward to the stem — conv1 (3->32, 3x3/s1 @576^2) + conv2
(32->64, 3x3/s2) — running at 4.4 TFLOP/s on 3.6 GFLOP while the 256ch
backbone stages hit 150-200 TFLOP/s.  This times isolated reformulations
that compute the SAME math:

  base      the model's lax.conv path (what XLA picks today)
  conv1/conv2 the two convs alone (which one is the floor?)
  patches1  conv1 as conv_general_dilated_patches -> [HW,27]x[27,32] matmul
  s2d2      conv2 as space-to-depth(2x) -> 2x2-kernel conv on 128ch
  both      patches1 + s2d2
  bf16in    baseline with a bfloat16 input image

All candidates are checked against the baseline output (bf16 tolerance)
before timing.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_stem.py
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache

S = 576


def leaky(x):
    return jnp.maximum(0.1 * x, x)


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def stem_base(x, w1, w2):
    return leaky(conv(leaky(conv(x.astype(jnp.bfloat16), w1, 1)), w2, 2))


def conv1_only(x, w1, w2):
    return leaky(conv(x.astype(jnp.bfloat16), w1, 1))


def conv2_only(h, w1, w2):
    return leaky(conv(h, w2, 2))


def conv1_patches(x, w1):
    # 3x3 patches -> one [S*S, 27] x [27, 32] matmul on the MXU
    p = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.bfloat16), (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,S,S,27] (C-major)
    b = p.shape[0]
    # patches layout is [C_in * KH * KW] with channel slowest; build the
    # matching weight reshape from HWIO w1 [3,3,3,32]
    wm = jnp.transpose(w1, (2, 0, 1, 3)).reshape(27, 32)
    out = jnp.einsum("bhwk,ko->bhwo", p, wm,
                     preferred_element_type=jnp.bfloat16)
    return out.astype(jnp.bfloat16)


def stem_patches1(x, w1, w2):
    return leaky(conv(leaky(conv1_patches(x, w1)), w2, 2))


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def conv2_s2d(h, w2):
    """conv 3x3/s2 on [S,S,32] == conv 2x2/s1 on s2d [S/2,S/2,128].

    Output(y,x) reads input rows 2y-1..2y+1, cols 2x-1..2x+1.  In s2d
    coords (a,p) with row=2a+p, that window is a in {y-1, y} (2 taps) and
    within each cell both parities — a 2x2 kernel over the 4c channels,
    with the weight of tap (ky,kx) routed to parity ((ky+1)%2,(kx+1)%2)
    and cell offset ((ky+1)//2 - 1 + 1, ...) — built below by scatter.
    """
    c_in, c_out = 32, 64
    w4 = jnp.zeros((2, 2, 4 * c_in, c_out), w2.dtype)
    for ky in range(3):
        for kx in range(3):
            # SAME/s2 on even size pads ONLY bottom/right (total pad 1), so
            # output y reads rows {2y, 2y+1, 2y+2}: tap a-y = ky//2,
            # parity ky%2
            a, p = divmod(ky, 2)
            bq, q = divmod(kx, 2)
            w4 = w4.at[a, bq, (p * 2 + q) * c_in:(p * 2 + q + 1) * c_in, :].set(
                w2[ky, kx])
    hs = s2d(h)
    # the ky=2 tap reads cell y+1 (parity 0): pad 1 cell at bottom/right
    return jax.lax.conv_general_dilated(
        hs, w4, (1, 1), [(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def stem_s2d2(x, w1, w2):
    return leaky(conv2_s2d(leaky(conv(x.astype(jnp.bfloat16), w1, 1)), w2))


def stem_both(x, w1, w2):
    return leaky(conv2_s2d(leaky(conv1_patches(x, w1)), w2))


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, S, S, 3).astype(np.float32))
    w1 = jnp.asarray((rng.rand(3, 3, 3, 32) - 0.5).astype(np.float32) * 0.2,
                     jnp.bfloat16)
    w2 = jnp.asarray((rng.rand(3, 3, 32, 64) - 0.5).astype(np.float32) * 0.1,
                     jnp.bfloat16)

    base = jax.jit(stem_base)(x, w1, w2)
    h1 = jax.jit(conv1_only)(x, w1, w2)
    results = {}

    def check(name, fn, *args):
        out = jax.jit(fn)(*args)
        if out.shape == base.shape:
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - base.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(base.astype(jnp.float32))))
            ok = diff <= 0.02 * max(scale, 1.0)
            print(f"{name}: max|diff|={diff:.5f} (scale {scale:.2f}) ok={ok}")
            assert ok, name

    candidates = {
        "base": (stem_base, (x, w1, w2)),
        "conv1_only": (conv1_only, (x, w1, w2)),
        "conv2_only": (conv2_only, (h1, w1, w2)),
        "patches1": (stem_patches1, (x, w1, w2)),
        "s2d2": (stem_s2d2, (x, w1, w2)),
        "both": (stem_both, (x, w1, w2)),
        "bf16in": (stem_base, (x.astype(jnp.bfloat16), w1, w2)),
    }
    for name, (fn, args) in candidates.items():
        check(name, fn, *args)
        x0 = args[0]
        rest = args[1:]
        t = chain_scan_time(
            lambda c, *a, fn=fn: (fn(c, *a).astype(jnp.float32).sum()
                                  + 0 * jnp.sum(c.astype(jnp.float32))),
            x0, n=30, args=rest)
        results[name] = round(t * 1e3, 4)
        print(f"{name:12s}: {t*1e3:7.3f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
