"""Chain-scan time of the full jitted train step (fwd+bwd+Adam) at 576^2.

Round-1 baseline: 17.3 ms/step at batch 2 (BENCHMARKS.md).  The step
includes NMS proposals for the mask ROI loss, so the fixpoint NMS and the
batch-level fallback cond (round 2) should show up here too.

Round-3 additions: ``--remat`` (per-layer ConvBN rematerialization,
cfg.remat), a batch sweep (pass several batch sizes to map throughput vs
batch and find the HBM ceiling with/without remat), and — unless
``--no-donate`` — a post-chain donated-dispatch loop that checks the
Solver's real in-place-update path fits at each batch.

Usage:
  PYTHONPATH=/root/.axon_site:. python scripts/bench_train_step.py [b ...]
  PYTHONPATH=/root/.axon_site:. python scripts/bench_train_step.py --remat 8 16
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import train_step as ts
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def make_batch(cfg: DISYoloConfig, b: int):
    s, t, g = cfg.image_size, cfg.max_box_per_image, cfg.base_grid
    rng = np.random.RandomState(0)
    return dict(
        images=jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32)),
        true_masks=jnp.zeros((b, t, s, s), bool).at[:, 0, 60:240, 60:240]
        .set(True),
        true_boxes=jnp.zeros((b, 1, 1, 1, t, 5)).at[:, 0, 0, 0, 0].set(
            jnp.asarray([0.26, 0.26, 0.42, 0.42, 1.0])),
        labels_s8=jnp.zeros((b, 4 * g, 4 * g, 3, 5 + cfg.num_class)).at[
            :, 24, 24, 0, :].set(
            jnp.asarray([0.26, 0.26, 0.42, 0.42, 1., 0., 1., 0.])),
        labels_s16=jnp.zeros((b, 2 * g, 2 * g, 3, 5 + cfg.num_class)),
        labels_s32=jnp.zeros((b, g, g, 3, 5 + cfg.num_class)),
        windows=jnp.tile(jnp.asarray([0., 0., 1., 1.]), (b, 1)),
    )


def bench_one(batch: int, remat: bool, donate: bool) -> float:
    cfg = DISYoloConfig(batch_size=batch, remat=remat)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(variables["params"], cfg)
    state = ts.TrainState(variables["params"], variables["batch_stats"],
                          tx.init(variables["params"]), jnp.asarray(0))
    batch_data = make_batch(cfg, batch)
    # donation inside the traced chain body is inlined (ignored), so the
    # chain measures compute either way
    step_fn = ts.make_jitted_train_step(model, tx)

    def body(images, st, bd):
        bd = dict(bd, images=images)
        new_state, metrics = step_fn(st, bd, jax.random.PRNGKey(1))
        # consume the params delta + loss so the whole step must execute
        delta = jax.tree.reduce(
            lambda a, x: a + x.astype(jnp.float32).sum(),
            new_state.params, 0.0)
        return metrics["total_loss"] + delta * 1e-12

    # state + batch go through ``args`` (jit arguments): as closure consts
    # they embed ~GB of literals into the remote-compile payload (HTTP 413)
    dt = chain_scan_time(body, batch_data["images"], n=20,
                         args=(state, batch_data))
    if donate:
        # exercise the Solver's real donated dispatch path at this batch —
        # peak HBM here is 1 state + activations (the production ceiling);
        # the state is dead after this loop, which is what donation needs
        step_d = ts.make_jitted_train_step(model, tx, donate=True)
        for i in range(2):
            state, _ = step_d(state, batch_data, jax.random.PRNGKey(i))
        jax.block_until_ready(jax.tree.leaves(state.params)[0])
    return dt


def main():
    enable_compilation_cache()
    args = [a for a in sys.argv[1:]]
    remat = "--remat" in args
    donate = "--no-donate" not in args
    batches = [int(a) for a in args if not a.startswith("--")] or [2]
    print(f"backend: {jax.default_backend()}, remat={remat}, donate={donate}")

    for b in batches:
        try:
            dt = bench_one(b, remat, donate)
        except Exception as e:  # XLA OOM at the HBM ceiling
            msg = str(e).splitlines()[0][:120]
            print(f"train step 576 batch {b}: FAILED ({msg})", flush=True)
            continue
        print(f"train step 576 batch {b}: {dt*1e3:.2f} ms/step "
              f"({dt*1e3/b:.2f} ms/img, {b/dt:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
