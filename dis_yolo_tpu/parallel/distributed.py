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


def host_local_to_global(mesh: Mesh, host_batch: Dict[str, np.ndarray],
                         axis_name: str = "dp"):
    """Assemble per-host numpy shards into global batch-sharded jax.Arrays.

    Each process passes its local shard (leading dim = global/num_hosts);
    the result is a global view usable by a jitted step with NamedSharding
    constraints.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def make(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        local_devices = [d for d in mesh.devices.flat
                         if d.process_index == jax.process_index()]
        per_dev = np.split(x, len(local_devices), axis=0)
        buffers = [jax.device_put(s, d) for s, d in zip(per_dev, local_devices)]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, buffers)

    return jax.tree.map(make, host_batch)
