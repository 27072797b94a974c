"""Multi-host (multi-process) initialization and per-host data sharding.

The reference has no distributed code (SURVEY.md §2: single GPU, no
NCCL/MPI).  TPU-native design: one JAX process per host,
``jax.distributed.initialize`` over DCN for control, XLA collectives over
ICI for gradients.  Each host feeds only its local shard of the global
batch; ``host_local_to_global`` assembles the global jax.Array view.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-ops for single-process runs.

    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS etc.)
    or TPU-pod metadata when available.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D DP mesh over every chip of every host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def per_host_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def assembly_plan(mesh_devices, process_index: int, process_count: int,
                  local_shape):
    """Pure planning half of ``host_local_to_global`` (unit-testable with
    mocked multi-process device lists).

    Returns (global_shape, local_devices, slices): the global array shape,
    this process's devices in mesh order, and the [start, stop) row slice of
    the *local* shard that lands on each of them.  Row order follows the
    mesh's flat device order, so concatenating every host's shards in mesh
    order reconstructs the global batch — exactly the layout
    NamedSharding(P(dp)) expects.
    """
    local_devices = [d for d in mesh_devices
                     if d.process_index == process_index]
    assert local_devices, f"process {process_index} owns no mesh devices"
    n_local = len(local_devices)
    assert local_shape[0] % n_local == 0, (local_shape, n_local)
    rows = local_shape[0] // n_local
    global_shape = (local_shape[0] * process_count,) + tuple(local_shape[1:])
    slices = [(i * rows, (i + 1) * rows) for i in range(n_local)]
    return global_shape, local_devices, slices


def replicate_to_global(mesh: Mesh, tree):
    """Per-host identical values -> fully-replicated global jax.Arrays.

    Every process must pass the SAME values (e.g. a TrainState initialized
    from the same PRNG seed).  Each process places the full array on its
    addressable mesh devices; the assembled global array is replicated, so
    it can feed a jitted step whose state is P() and be read back
    (``float(metrics[...])``) from any host.
    """
    sharding = NamedSharding(mesh, P())
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]

    def make(x):
        x = np.asarray(x)
        bufs = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, sharding,
                                                        bufs)

    return jax.tree.map(make, tree)


def host_local_to_global(mesh: Mesh, host_batch: Dict[str, np.ndarray],
                         axis_name: str = "dp"):
    """Assemble per-host numpy shards into global batch-sharded jax.Arrays.

    Each process passes its local shard (leading dim = global/num_hosts);
    the result is a global view usable by a jitted step with NamedSharding
    constraints.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def make(x):
        global_shape, local_devices, slices = assembly_plan(
            list(mesh.devices.flat), jax.process_index(),
            jax.process_count(), x.shape)
        buffers = [jax.device_put(x[lo:hi], d)
                   for (lo, hi), d in zip(slices, local_devices)]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, buffers)

    return jax.tree.map(make, host_batch)
