"""Peak-HBM evidence for TrainState donation (train step, 576^2).

Runs two dispatch loops of the jitted train step at the given batch size
— donate=False (double-buffered state) vs donate=True (the Solver path,
in-place update) — and reports the device allocator's peak bytes after
each.  Expectation: donation saves ~1 state (params f32 246 MB + Adam
moments 2x246 MB ~ 0.75 GB) of peak.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/probe_donation_hbm.py [batch]

Note: the tunneled axon device returns an empty ``memory_stats()`` (peak
reads 0 MB), so this probe only yields numbers on a directly-attached
TPU/GPU host.  On the tunnel, the donation evidence is the batch *ceiling*
instead: `scripts/bench_train_step.py` maps which batch sizes fit.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import train_step as ts
from dis_yolo_tpu.utils.runtime import enable_compilation_cache
from scripts.bench_train_step import make_batch


def peak_mb() -> float:
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def run(batch: int, donate: bool) -> float:
    cfg = DISYoloConfig(batch_size=batch)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(variables["params"], cfg)
    state = ts.TrainState(variables["params"], variables["batch_stats"],
                          tx.init(variables["params"]), jnp.asarray(0))
    batch_data = make_batch(cfg, batch)
    step = ts.make_jitted_train_step(model, tx, donate=donate)
    for i in range(3):
        state, _ = step(state, batch_data, jax.random.PRNGKey(i))
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    return peak_mb()


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"backend: {jax.default_backend()}, batch {batch}")
    if not (jax.local_devices()[0].memory_stats() or {}):
        print("memory_stats() unavailable on this backend — no peak-HBM "
              "numbers here; use the bench_train_step batch ceiling instead")
        return
    # donate first: allocator peak is monotone within a process, so the
    # smaller (donated) footprint must be measured before the larger one
    a = run(batch, donate=True)
    print(f"peak after donate=True : {a:.0f} MB")
    b = run(batch, donate=False)
    print(f"peak after donate=False: {b:.0f} MB (delta {b - a:.0f} MB)")


if __name__ == "__main__":
    main()
