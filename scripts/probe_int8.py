"""Probe: does int8 conv/matmul hit the v5e double-rate MXU path?

The v5 lite MXU advertises ~394 TOPS int8 vs ~197 TFLOP/s bf16.  If XLA
lowers s8xs8->s32 `lax.conv_general_dilated` / `dot_general` to the
double-rate path, a post-training-quantized deploy graph could halve the
FLOP-bound part of serving latency.  This probes raw support + achieved
rate before we invest in a quantized deploy path.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/probe_int8.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def bench_conv(dtype, ch, size, batch=1, n_layers=12, kernel=3):
    k = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        w = (jax.random.normal(k, (kernel, kernel, ch, ch)) * 20).astype(jnp.int8)
        acc = jnp.int32
    else:
        w = jax.random.normal(k, (kernel, kernel, ch, ch), dtype) * 0.01
        acc = jnp.float32
    # f32 carry (chain_scan_time folds an f32 scalar into the carry);
    # cast to the probe dtype inside the body
    x0 = jax.random.normal(k, (batch, size, size, ch), jnp.float32)

    def body(xf):
        y = (xf * 20).astype(dtype) if dtype == jnp.int8 else xf.astype(dtype)
        for _ in range(n_layers):
            z = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            # renormalize back to the input dtype so the chain is stable
            y = (z >> 7).astype(jnp.int8) if dtype == jnp.int8 \
                else z.astype(dtype) * 0.1
        return y.astype(jnp.float32).sum()

    t = chain_scan_time(body, x0, n=5)
    per_conv = t / n_layers
    ops = 2 * batch * size * size * ch * ch * kernel * kernel
    return per_conv, ops / per_conv / 1e12


def main():
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    for ch, size, batch in ((256, 72, 1), (256, 72, 4), (512, 36, 4),
                            (128, 144, 4)):
        row = f"ch={ch:4d} @{size}^2 b={batch}:"
        for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            try:
                per, tops = bench_conv(dt, ch, size, batch)
                row += f"  {name} {per*1e6:7.1f} us ({tops:6.1f} T/s)"
            except Exception as e:  # noqa: BLE001 - probe must report, not die
                row += f"  {name} FAILED ({type(e).__name__}: {str(e)[:60]})"
        print(row, flush=True)


if __name__ == "__main__":
    main()
