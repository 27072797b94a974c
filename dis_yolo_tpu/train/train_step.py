"""Jitted training step: fwd + bwd + Adam, with DP sharding variants.

Replaces the reference's Session-driven ``sess.run([loss, optimizer])``
(train_yolo3_mask.py:158/216) with a single compiled function containing
the whole step.  The total loss reproduces ``tf.losses.get_total_loss()``
(yolo3_net_pos.py:61): conf + class + coord + mask losses plus the L2
regularizer (scale 1e-4, i.e. 5e-5 * sum(w^2)) over the *unlocked* conv
kernels and biases (locked layers are created without a regularizer,
yolo3_net_pos.py:112-123).

Layer-lock (transfer-learning stage 1) is enforced by masking the optimizer
update for every parameter under a locked ``convolutionalN`` module —
functional equivalent of TF's ``trainable=False``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.losses.mask_loss import mask_loss
from dis_yolo_tpu.losses.yolo_loss import yolo_loss
from dis_yolo_tpu.models.dis_yolo import DISYolo
from dis_yolo_tpu.ops import nms
from dis_yolo_tpu.ops.decode import decode_all


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _layer_id_of_path(path) -> int:
    """Extract N from a params path containing 'convolutionalN', else -1."""
    for p in path:
        name = getattr(p, "key", None)
        if isinstance(name, str) and name.startswith("convolutional"):
            try:
                return int(name[len("convolutional"):])
            except ValueError:
                return -1
    return -1


def trainable_mask(params, cfg: DISYoloConfig):
    """Pytree of bools: False for every param of a locked layer."""
    locked = set(cfg.locked_layers)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _layer_id_of_path(path) not in locked, params)


def l2_params_mask(params, cfg: DISYoloConfig):
    """True for conv kernels/biases of unlocked layers (BN excluded)."""
    locked = set(cfg.locked_layers)

    def pick(path, _):
        if _layer_id_of_path(path) in locked:
            return False
        names = [getattr(p, "key", "") for p in path]
        return "conv" in names  # the nn.Conv submodule: kernel + bias
    return jax.tree_util.tree_map_with_path(pick, params)


def reference_lr_schedule(step: jnp.ndarray) -> jnp.ndarray:
    """Piecewise LR of the reference stage-2 run (train_yolo3_mask.py:134-141)."""
    return jnp.where(step <= 10000, 1e-3,
           jnp.where(step <= 20000, 1e-4,
           jnp.where(step <= 25000, 1e-5, 1e-6)))


def piecewise_lr_schedule(cfg: DISYoloConfig):
    """cfg-driven piecewise LR; the defaults reproduce
    ``reference_lr_schedule`` exactly (lr_values[i] while
    step <= lr_boundaries[i], last value afterwards)."""
    bounds = jnp.asarray(cfg.lr_boundaries)
    values = jnp.asarray(cfg.lr_values)

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        return values[jnp.sum(step > bounds)]

    return schedule


def make_optimizer(params, cfg: DISYoloConfig,
                   lr_schedule=None) -> optax.GradientTransformation:
    if lr_schedule is None:
        lr_schedule = piecewise_lr_schedule(cfg)
    mask = trainable_mask(params, cfg)
    labels = jax.tree.map(lambda t: "train" if t else "frozen", mask)
    opt = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -lr_schedule(s + 1)),
    )
    # frozen params get a hard zero update (TF trainable=False parity);
    # optax.masked would instead pass raw gradients through untouched.
    return optax.multi_transform({"train": opt, "frozen": optax.set_to_zero()},
                                 labels)


def total_loss_fn(params, batch_stats, batch: Dict[str, jnp.ndarray],
                  key: jax.Array, model: DISYolo
                  ) -> Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]:
    """Full training loss. ``batch`` fields (the reference 7-tuple):

    images [B,H,W,3], true_masks [B,T,H,W] bool, true_boxes [B,1,1,1,T,5],
    labels_s8 / labels_s16 / labels_s32 [B,h,w,A,5+C], windows [B,4].
    """
    cfg = model.cfg
    variables = {"params": params, "batch_stats": batch_stats}
    (raw_s8, raw_s16, raw_s32, scoremaps), new_stats = model.apply(
        variables, batch["images"], train=True, mutable=["batch_stats"])
    preds = decode_all([raw_s8, raw_s16, raw_s32], cfg)

    losses = yolo_loss(preds, batch["true_boxes"],
                       [batch["labels_s8"], batch["labels_s16"], batch["labels_s32"]],
                       cfg)

    # proposals for the mask subnet; rounding inside the assembly already
    # kills any box gradient in the reference, so stop_gradient is exact
    dets = jax.lax.stop_gradient(
        nms.filter_detections(preds, batch["windows"], cfg, cfg.obj_threshold))
    m_loss = mask_loss(key, scoremaps, dets, batch["true_boxes"],
                       batch["true_masks"], cfg)

    l2_mask = l2_params_mask(params, cfg)
    l2 = 0.5 * cfg.l2_scale * sum(
        jnp.sum(jnp.square(p)) for p, m in
        zip(jax.tree.leaves(params), jax.tree.leaves(l2_mask)) if m)

    total = (losses["conf_loss"] + losses["class_loss"] + losses["coord_loss"]
             + m_loss + l2)
    metrics = dict(losses)
    metrics.update(mask_loss=m_loss, l2_loss=l2, total_loss=total)
    return total, (new_stats["batch_stats"], metrics)


def train_step(state: TrainState, batch, key, model: DISYolo,
               tx: optax.GradientTransformation):
    grad_fn = jax.value_and_grad(total_loss_fn, has_aux=True)
    (_, (new_stats, metrics)), grads = grad_fn(
        state.params, state.batch_stats, batch, key, model)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics


def make_jitted_train_step(model: DISYolo, tx: optax.GradientTransformation,
                           mesh: Mesh = None, dp_axis: str = "dp"):
    """Compile the train step.

    With a ``mesh``, inputs are constrained batch-sharded and state
    replicated; XLA turns the gradient reduction into a psum over ICI.
    """
    base_step = functools.partial(train_step, model=model, tx=tx)
    if model.cfg.device_side_augs:
        from dis_yolo_tpu.data.device_augment import augment_batch

        def step_fn(state, batch, key):
            ka, kb = jax.random.split(key)
            batch = augment_batch(ka, batch, model.cfg.image_size,
                                  flips=model.cfg.flipped,
                                  photometric=model.cfg.blur_noise_light)
            return base_step(state, batch, kb)
    else:
        step_fn = base_step
    if mesh is None:
        return jax.jit(step_fn)

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(dp_axis))

    def sharded_step(state, batch, key):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: bsh, batch))
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(lambda _: repl, state))
        return step_fn(state, batch, key)

    return jax.jit(sharded_step, out_shardings=repl)
