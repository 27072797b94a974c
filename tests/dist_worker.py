"""Worker for the real 2-process ``jax.distributed`` tests.

Launched twice by tests/test_parallel.py with a loopback coordinator.

Modes (argv):
  <coordinator> <pid>                       — init smoke test (round-3):
      ``distributed.initialize`` + ``global_mesh`` + ``host_local_to_global``
      + one jitted global reduction.
  <coordinator> <pid> train <data_root> <out_dir> — cross-process DP
      training (VERDICT r3 next #3): N shard_map train steps on per-host
      batches assembled via ``host_local_to_global``, a cooperative
      multi-host Orbax save, an on-disk restore equality check, and one
      post-restore step.  Prints one line ``LOSSES <json>`` for the pytest
      driver to compare against the single-process 4-device dryrun.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # never touch the TPU tunnel

N_STEPS = 3


def smoke(pid: int):
    from dis_yolo_tpu.parallel import distributed as dist

    mesh = dist.global_mesh()
    assert mesh.devices.size == 4, mesh.devices.shape   # 2 procs x 2 devices

    import numpy as np
    import jax.numpy as jnp

    assert dist.per_host_batch_size(8) == 4
    local = {"x": np.full((4, 3), float(pid + 1), np.float32)}
    g = dist.host_local_to_global(mesh, local)
    assert g["x"].shape == (8, 3)

    # a jitted global reduction proves the assembled array is usable:
    # sum = 4*3*1 (host 0 rows) + 4*3*2 (host 1 rows) = 36
    total = float(jax.jit(jnp.sum, out_shardings=None)(g["x"]))
    assert total == 36.0, total
    print(f"worker {pid} OK", flush=True)


def train(pid: int, data_root: str, out_dir: str):
    import numpy as np
    import jax.numpy as jnp

    # the mesh-step compile is minutes on a contended 1-core CPU host;
    # repeat runs must hit the persistent cache
    from dis_yolo_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.data.dataset import ParallelTrainData
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.parallel import distributed as dist
    from dis_yolo_tpu.train import checkpoint as ckpt
    from dis_yolo_tpu.train import train_step as ts

    mesh = dist.global_mesh()
    assert mesh.devices.size == 4

    # identical config/seed on both hosts -> identical init values; the
    # shapes must match tests/test_parallel.py::_dist_train_reference
    cfg = DISYoloConfig(dataset=data_root, image_size=64, test_size=64,
                        batch_size=4, pre_nms_top_k=64,
                        compute_dtype="float32")
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    state = dist.replicate_to_global(mesh, state)

    # per-host loader: this host builds ONLY its rows of each global batch
    data = ParallelTrainData(cfg, "train", seed=5, workers=0,
                             host_shard=(pid, jax.process_count()))
    step_fn = ts.make_jitted_train_step(model, tx, mesh=mesh)

    local = data.get()
    assert local["images"].shape[0] == dist.per_host_batch_size(4)
    first_batch = dist.host_local_to_global(mesh, local)

    # AOT-compile on both hosts, then meet at a coordination-service (DCN)
    # barrier BEFORE the first collective execution: Gloo's cross-process
    # rendezvous times out after 30 s, while a cold XLA:CPU compile of the
    # mesh step takes minutes on a 1-core host — without the barrier,
    # compile skew between the workers kills the first pmean.
    compiled = step_fn.lower(state, first_batch,
                             jax.random.PRNGKey(0)).compile()
    from jax._src.distributed import global_state
    global_state.client.wait_at_barrier("dyt_step_compiled", 1_800_000)

    losses = []
    batch = first_batch
    for t in range(N_STEPS):
        state, metrics = compiled(state, batch, jax.random.PRNGKey(123 + t))
        losses.append(float(metrics["total_loss"]))
        if t + 1 < N_STEPS:
            batch = dist.host_local_to_global(mesh, data.get())

    # cooperative multi-host save (every process calls; Orbax coordinates)
    path = ckpt.save_checkpoint(out_dir, state, int(state.step), wait=True)

    # disk roundtrip: restore and compare a few leaves on every host
    restored = ckpt.restore_checkpoint(path, state)
    assert int(restored.step) == N_STEPS
    for a, b in list(zip(jax.tree.leaves(restored.params),
                         jax.tree.leaves(state.params)))[:5]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored state must be directly trainable
    batch = dist.host_local_to_global(mesh, data.get())
    restored, metrics = compiled(restored, batch,
                                 jax.random.PRNGKey(123 + N_STEPS))
    post = float(metrics["total_loss"])
    assert np.isfinite(post), post
    losses.append(post)

    if pid == 0:
        with open(os.path.join(out_dir, "losses.json"), "w") as f:
            json.dump(losses, f)
    print(f"LOSSES {json.dumps(losses)}", flush=True)
    print(f"worker {pid} OK", flush=True)


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from dis_yolo_tpu.parallel import distributed as dist

    dist.initialize(coordinator=coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    if len(sys.argv) > 3 and sys.argv[3] == "train":
        train(pid, sys.argv[4], sys.argv[5])
    else:
        smoke(pid)


if __name__ == "__main__":
    main()
