"""Worker for the real 2-process ``jax.distributed`` smoke test.

Launched twice by tests/test_parallel.py::test_two_process_distributed_init
with a loopback coordinator; exercises ``parallel.distributed.initialize``
+ ``global_mesh`` + ``host_local_to_global`` end-to-end (the init path the
round-2 verdict flagged as never having executed) and checks a global
reduction over the assembled array.

argv: <coordinator addr> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # never touch the TPU tunnel


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from dis_yolo_tpu.parallel import distributed as dist

    dist.initialize(coordinator=coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

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


if __name__ == "__main__":
    main()
