"""Chain-scan time of the full jitted train step (fwd+bwd+Adam) at 576^2.

Round-1 baseline: 17.3 ms/step at batch 2 (BENCHMARKS.md).  The step
includes NMS proposals for the mask ROI loss, so the fixpoint NMS and the
batch-level fallback cond (round 2) should show up here too.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_train_step.py [batch]
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


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(f"backend: {jax.default_backend()}, batch {batch}")

    cfg = DISYoloConfig(batch_size=batch)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(variables["params"], cfg)
    state = ts.TrainState(variables["params"], variables["batch_stats"],
                          tx.init(variables["params"]), jnp.asarray(0))

    b, s, t, g = batch, cfg.image_size, cfg.max_box_per_image, cfg.base_grid
    rng = np.random.RandomState(0)
    batch_data = dict(
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

    step_fn = ts.make_jitted_train_step(model, tx)

    def body(images):
        bd = dict(batch_data, images=images)
        new_state, metrics = step_fn(state, bd, jax.random.PRNGKey(1))
        # consume the params delta + loss so the whole step must execute
        delta = jax.tree.reduce(
            lambda a, x: a + x.astype(jnp.float32).sum(),
            new_state.params, 0.0)
        return metrics["total_loss"] + delta * 1e-12

    dt = chain_scan_time(body, batch_data["images"], n=20)
    print(f"train step 576 batch {batch}: {dt*1e3:.2f} ms/step "
          f"({dt*1e3/batch:.2f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
