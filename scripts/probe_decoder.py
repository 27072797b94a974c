"""Mask-decoder budget attack (VERDICT r4 weak #4 / next #5).

forward_budget.py attributes 0.331 ms / 22.6 TF/s (17% of the 576^2
forward) to the stride-2 mask decoder conv76-82
(models/dis_yolo.py:179-204; reference yolo3_net_pos.py:380-412).  The
cause hypothesis is the stem's: 32-64 input channels fill 1/4-1/2 of the
128-wide MXU lane dimension, so the systolic array runs at a fraction of
peak no matter how XLA schedules it.

Two mathematically-exact reformulations are measured against the
as-written ops, each verified numerically before timing:

  1. **s2d-packed 3x3 (conv81)**: a stride-1 3x3 conv at 288^2 x 32ch
     equals, in space-to-depth(2) coordinates, a 3x3 conv at 144^2 with
     128 in / 256 out channels (4 output phases) and a 75%-zeros kernel
     built from the original weights.  4x the nominal FLOPs, but the
     lane dimension is exactly full — if the small-channel penalty is
     schedulable, this wins; if the MXU already pads lanes for free,
     it loses 4x.

  2. **commuted 1x1-before-upsample (conv77/conv80)**: a 1x1 conv
     commutes with nearest-neighbor upsampling, so the "up" half of the
     concat [skip, up2(m)] -> 1x1 can run at quarter resolution:
     conv1x1(concat) == concat-free sum of conv1x1(skip) +
     up2(conv1x1(m)) with the kernel split row-wise.  Exact (nearest
     duplication is per-pixel), and removes the materialized concat.

Timings use chain_scan_time (the only trustworthy method on this
tunneled chip — see BENCHMARKS header).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_decoder.py
"""

from __future__ import annotations

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu.utils.profiling import chain_scan_time


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def s2d(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C]; phase order (dy,dx) = 00,01,10,11."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def pack_kernel_s2d(w):
    """[3,3,Cin,Cout] 3x3 kernel -> [3,3,4Cin,4Cout] acting in s2d space.

    Output phase (dy,dx), tap (u,v) in the original reads global offset
    (gy, gx) = (dy+u-1, dx+v-1) from the output macro-pixel origin; in
    s2d space that input lives at macro tap (gy//2, gx//2) (python
    floor-div, correct for the negative offsets) in phase channel block
    (gy%2, gx%2).  All 36 (tap, phase) slots minus the 9 live ones stay
    zero — the MXU multiplies the zeros, which is the 4x-FLOPs price of
    full lane occupancy.
    """
    cin, cout = w.shape[2], w.shape[3]
    w2 = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            for u in range(3):
                for v in range(3):
                    gy, gx = dy + u - 1, dx + v - 1       # global offsets
                    qy, py = gy // 2, gy % 2              # python floor-div
                    qx, px = gx // 2, gx % 2
                    # s2d tap (qy+1, qx+1); input channel block = phase
                    # (py,px); output block = phase (dy,dx)
                    w2[qy + 1, qx + 1,
                       (2 * py + px) * cin:(2 * py + px + 1) * cin,
                       (2 * dy + dx) * cout:(2 * dy + dx + 1) * cout] \
                        += w[u, v]
    return jnp.asarray(w2)


def up2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


def main():
    rng = np.random.RandomState(0)
    report = {}
    f32 = np.float32

    # ---------------- 1. conv81: 3x3 32->64 @288^2 ----------------
    x = jnp.asarray(rng.randn(1, 288, 288, 32).astype(f32))
    w = rng.randn(3, 3, 32, 64).astype(f32) * 0.05
    wj = jnp.asarray(w)
    w2 = pack_kernel_s2d(w)

    base = jax.jit(lambda x: conv(x.astype(jnp.bfloat16),
                                  wj.astype(jnp.bfloat16)))
    packed = jax.jit(lambda x: d2s(conv(s2d(x.astype(jnp.bfloat16)),
                                        w2.astype(jnp.bfloat16))))
    # numerics: verify in f32 (bf16 sums order-differ; f32 proves algebra)
    ref = conv(x, wj)
    got = d2s(conv(s2d(x), w2))
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, f"s2d algebra broken: rel err {err}"
    t_base = chain_scan_time(base, x, n=20)
    t_packed = chain_scan_time(packed, x, n=20)
    report["conv81_3x3_32to64_288"] = {
        "algebra_rel_err_f32": err,
        "baseline_us": round(t_base * 1e6, 1),
        "s2d_packed_us": round(t_packed * 1e6, 1),
        "speedup": round(t_base / t_packed, 2),
        "note": "packed = 4x nominal FLOPs at full 128-lane occupancy",
    }
    print(json.dumps(report["conv81_3x3_32to64_288"]), flush=True)

    # ---------------- 2. conv80: 1x1 concat(128 skip + 32 up) -> 32 @288^2
    skip = jnp.asarray(rng.randn(1, 288, 288, 128).astype(f32))
    msm = jnp.asarray(rng.randn(1, 144, 144, 32).astype(f32))
    wc = rng.randn(1, 1, 160, 32).astype(f32) * 0.05
    wcj = jnp.asarray(wc)
    w_skip, w_up = wcj[:, :, :128], wcj[:, :, 128:]

    base2 = jax.jit(lambda s, m: conv(
        jnp.concatenate([s, up2(m)], -1).astype(jnp.bfloat16),
        wcj.astype(jnp.bfloat16)))
    comm2 = jax.jit(lambda s, m: conv(s.astype(jnp.bfloat16),
                                      w_skip.astype(jnp.bfloat16))
                    + up2(conv(m.astype(jnp.bfloat16),
                               w_up.astype(jnp.bfloat16))))
    ref = conv(jnp.concatenate([skip, up2(msm)], -1), wcj)
    got = conv(skip, w_skip) + up2(conv(msm, w_up))
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, f"commute algebra broken: rel err {err}"
    t_base = chain_scan_time(functools.partial(base2, skip), msm, n=60)
    t_comm = chain_scan_time(functools.partial(comm2, skip), msm, n=60)
    report["conv80_1x1_concat160to32_288"] = {
        "algebra_rel_err_f32": err,
        "baseline_us": round(t_base * 1e6, 1),
        "commuted_us": round(t_comm * 1e6, 1),
        "speedup": round(t_base / max(t_comm, 1e-9), 2),
        "note": "up-branch 1x1 at 144^2 instead of 288^2; concat removed",
    }
    print(json.dumps(report["conv80_1x1_concat160to32_288"]), flush=True)

    # ---------------- 3. conv78: 3x3 64->128 @144^2 (the other 3x3) ----
    x78 = jnp.asarray(rng.randn(1, 144, 144, 64).astype(f32))
    w78 = rng.randn(3, 3, 64, 128).astype(f32) * 0.05
    w78j = jnp.asarray(w78)
    w78p = pack_kernel_s2d(w78)
    base3 = jax.jit(lambda x: conv(x.astype(jnp.bfloat16),
                                   w78j.astype(jnp.bfloat16)))
    packed3 = jax.jit(lambda x: d2s(conv(s2d(x.astype(jnp.bfloat16)),
                                         w78p.astype(jnp.bfloat16))))
    t_base = chain_scan_time(base3, x78, n=60)
    t_packed = chain_scan_time(packed3, x78, n=60)
    report["conv78_3x3_64to128_144"] = {
        "baseline_us": round(t_base * 1e6, 1),
        "s2d_packed_us": round(t_packed * 1e6, 1),
        "speedup": round(t_base / max(t_packed, 1e-9), 2),
    }
    print(json.dumps(report["conv78_3x3_64to128_144"]), flush=True)

    with open("/tmp/probe_decoder.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
