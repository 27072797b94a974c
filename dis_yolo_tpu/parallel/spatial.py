"""Spatial partitioning: shard the image height axis across chips.

The reference's only scaling axis besides batch is *resolution* (SURVEY.md
§5: fully-convolutional graph, grids derived from input shape).  For
inputs too large for one chip's HBM (or to cut latency on huge survey
imagery), the image is sharded along H over a 1-D mesh; XLA SPMD inserts
halo exchanges for every conv automatically — no manual communication.

This composes with data parallelism: a 2-D mesh ('dp', 'sp') shards batch
over one axis and height over the other.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.dis_yolo import DISYolo


def spatial_forward(model: DISYolo, mesh: Mesh, sp_axis: str = "sp",
                    dp_axis: Optional[str] = None):
    """Jitted forward with images sharded [dp?, H:sp, W, C].

    Returns a function (variables, images) -> raw outputs (replicated).
    The batch axis is sharded over ``dp_axis`` when given.
    """
    img_spec = P(dp_axis, sp_axis, None, None)
    img_sh = NamedSharding(mesh, img_spec)
    repl = NamedSharding(mesh, P())

    @jax.jit
    def run(variables, images):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        raws = model.apply(variables, images, train=False)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), raws)

    return run


def spatial_train_step(model: DISYolo, tx, mesh: Mesh, sp_axis: str = "sp",
                       dp_axis: str = "dp", donate: bool = False):
    """2-D dp x sp TRAINING step: batch sharded over ``dp_axis``, image
    height over ``sp_axis`` through the conv forward AND backward (XLA
    SPMD inserts the halo exchanges and their transposes), state
    replicated.

    Unlike the 1-D DP step (train_step.make_jitted_train_step — explicit
    ``shard_map`` with ONE fused gradient pmean), this is GSPMD: the
    partitioner transforms the *single-device* program, so BatchNorm
    moments, losses and gradients are exactly the single-device math by
    construction (no bn_axis needed), at the cost of partitioner-chosen
    collectives (per-parameter gradient all-reduces, all-gathers around
    the per-image NMS/ROI tail).  Use it when one image's activations
    exceed a chip (the resolution-scaling axis, SURVEY §5); prefer the
    shard_map DP step when batch parallelism alone fits.
    """
    from dis_yolo_tpu.train import train_step as ts

    img_sh = NamedSharding(mesh, P(dp_axis, sp_axis, None, None))
    batch_sh = NamedSharding(mesh, P(dp_axis))
    repl = NamedSharding(mesh, P())

    def step(state, batch, key):
        batch = ts.prepare_batch(batch)
        batch = {k: jax.lax.with_sharding_constraint(
                     v, img_sh if k == "images" else batch_sh)
                 for k, v in batch.items()}
        new_state, metrics = ts.train_step(state, batch, key, model, tx)
        return (jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, repl),
                    new_state),
                jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, repl),
                    metrics))

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def spatial_predict(model: DISYolo, mesh: Mesh, sp_axis: str = "sp",
                    obj_thresh: Optional[float] = None):
    """Full sharded-inference pipeline: conv stack runs height-sharded,
    the (tiny) decode/NMS/assembly tail runs replicated."""
    img_sh = NamedSharding(mesh, P(None, sp_axis, None, None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def run(variables, images, windows):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        dets, masks = api.predict(model, variables, images, windows,
                                  obj_thresh)
        return (jax.lax.with_sharding_constraint(dets, repl),
                jax.lax.with_sharding_constraint(masks, repl))

    return run
