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
from dis_yolo_tpu.losses.mask_loss import (mask_loss, mask_loss_per_image,
                                           resize_gt_masks)
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
    steps = []
    if cfg.grad_clip_norm > 0:
        steps.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    steps += [
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -lr_schedule(s + 1)),
    ]
    # frozen params get a hard zero update (TF trainable=False parity);
    # optax.masked would instead pass raw gradients through untouched.
    tx = optax.multi_transform(
        {"train": optax.chain(*steps), "frozen": optax.set_to_zero()}, labels)
    if cfg.skip_nonfinite_updates:
        # non-finite-gradient steps are skipped whole (see config.py); the
        # wrapper state's total_notfinite count is surfaced by the Solver
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def prepare_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Expand the loader's compact wire format on device (no-op otherwise).

    uint8 images -> f32/255 (XLA fuses the convert+scale into the first
    conv's operand pipeline) and bit-packed masks -> [B,T,S,S] bool via a
    shift-and-mask (np.packbits big-endian bit order).  Shipping uint8 +
    packed bits costs ~2.5x fewer host->device wire bytes per step — the
    dominant wall-clock term on a network-attached TPU.
    """
    batch = dict(batch)
    img = batch["images"]
    if img.dtype == jnp.uint8:
        batch["images"] = img.astype(jnp.float32) / 255.0
    if "masks_packed" in batch:
        packed = batch.pop("masks_packed")          # [B,T,S*S/8] uint8
        s = batch["images"].shape[1]
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (packed[..., None] >> shifts) & jnp.uint8(1)
        batch["true_masks"] = bits.reshape(
            packed.shape[0], packed.shape[1], s, s).astype(bool)
    return batch


def _per_image_roi_losses(keys, preds, windows, scoremaps, true_boxes,
                          masks_small, cfg: DISYoloConfig) -> jnp.ndarray:
    """[B] per-image NMS-proposal + ROI mask losses (no cross-image math).

    Every op here is strictly per-image, so under the mesh train step it
    runs device-locally inside ``shard_map``.  GSPMD auto-partitioning
    would instead lower each tiny vmapped ``lax.top_k`` (NMS shortlist /
    fixpoint ordering / random ROI takes) to an all-gather + replicated
    TopK custom-call — wasted wire bytes on a real mesh, and an unordered
    collective that can cross-deadlock the CPU in-process runtime used by
    the virtual-device dry run (see ``make_jitted_train_step``).
    """
    dets = jax.lax.stop_gradient(
        nms.filter_detections(preds, windows, cfg, cfg.obj_threshold))
    return mask_loss_per_image(keys, scoremaps, dets, true_boxes, masks_small,
                               cfg)


def total_loss_from_keys(params, batch_stats, batch: Dict[str, jnp.ndarray],
                         keys: jax.Array, model: DISYolo
                         ) -> Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]:
    """Full training loss from pre-split per-image RNG keys [B, 2].

    Taking per-image keys (instead of one key split inside) lets the mesh
    step shard the key array with the batch, so every image sees the same
    ROI-sampling randomness whether the step runs on 1 or N devices.
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
    true_boxes = batch["true_boxes"]
    if true_boxes.ndim == 6:
        true_boxes = true_boxes[:, 0, 0, 0]
    masks_small = resize_gt_masks(batch["true_masks"], scoremaps.shape[1])
    per_image = _per_image_roi_losses(keys, preds, batch["windows"],
                                      scoremaps, true_boxes, masks_small, cfg)
    m_loss = jnp.mean(per_image)

    l2_mask = l2_params_mask(params, cfg)
    l2 = 0.5 * cfg.l2_scale * sum(
        jnp.sum(jnp.square(p)) for p, m in
        zip(jax.tree.leaves(params), jax.tree.leaves(l2_mask)) if m)

    total = (losses["conf_loss"] + losses["class_loss"] + losses["coord_loss"]
             + m_loss + l2)
    metrics = dict(losses)
    metrics.update(mask_loss=m_loss, l2_loss=l2, total_loss=total)
    return total, (new_stats["batch_stats"], metrics)


def total_loss_fn(params, batch_stats, batch: Dict[str, jnp.ndarray],
                  key: jax.Array, model: DISYolo
                  ) -> Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]:
    """Full training loss. ``batch`` fields (the reference 7-tuple):

    images [B,H,W,3], true_masks [B,T,H,W] bool, true_boxes [B,1,1,1,T,5],
    labels_s8 / labels_s16 / labels_s32 [B,h,w,A,5+C], windows [B,4].
    """
    keys = jax.random.split(key, batch["images"].shape[0])
    return total_loss_from_keys(params, batch_stats, batch, keys, model)


def grads_and_aux(params, batch_stats, batch, keys, model: DISYolo):
    """(grads, new_batch_stats, metrics) over the batch, microbatched when
    ``cfg.grad_accum > 1``.

    Accumulation is a ``lax.scan`` over equal microbatch slices: only one
    microbatch's activations are live at a time, so the effective batch
    can exceed single-shot HBM.  Gradients/metrics are averaged —
    mean-of-equal-means equals the full-batch mean, and the L2 term is
    identical in every microbatch so its average is itself.  BN running
    stats thread through the carry (one momentum update per microbatch,
    i.e. the reference's semantics for consecutive small steps; batch
    *moments* see a microbatch, not the full batch — PARITY.md deviation).
    """
    grad_fn = jax.value_and_grad(total_loss_from_keys, has_aux=True)
    n = model.cfg.grad_accum
    if n <= 1:
        (_, (new_stats, metrics)), grads = grad_fn(params, batch_stats,
                                                   batch, keys, model)
        return grads, new_stats, metrics

    b = keys.shape[0]
    if b % n:
        raise ValueError(f"batch {b} not divisible by grad_accum {n}")
    micro = b // n
    mb = jax.tree.map(lambda x: x.reshape((n, micro) + x.shape[1:]), batch)
    mkeys = keys.reshape((n, micro) + keys.shape[1:])

    def one(stats, bat, k):
        (_, (new_stats, metrics)), grads = grad_fn(params, stats, bat, k,
                                                   model)
        return grads, new_stats, metrics

    g_s, _, m_s = jax.eval_shape(one, batch_stats,
                                 jax.tree.map(lambda x: x[0], mb), mkeys[0])
    zeros = lambda t: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t)

    def body(carry, xs):
        stats, gsum, msum = carry
        bat, k = xs
        grads, stats, metrics = one(stats, bat, k)
        return (stats, jax.tree.map(jnp.add, gsum, grads),
                jax.tree.map(jnp.add, msum, metrics)), None

    (new_stats, gsum, msum), _ = jax.lax.scan(
        body, (batch_stats, zeros(g_s), zeros(m_s)), (mb, mkeys))
    inv = 1.0 / n
    return (jax.tree.map(lambda g: g * inv, gsum), new_stats,
            jax.tree.map(lambda m: m * inv, msum))


def _guard_stats(cfg: DISYoloConfig, new_stats, old_stats):
    """Keep BN running stats finite (cfg.skip_nonfinite_updates).

    optax.apply_if_finite protects params/optimizer from a non-finite
    gradient, but the BN moving mean/var are updated in the *forward*
    pass — one batch whose activations overflow would poison the EMA
    forever.  If any new stat is non-finite, keep the whole old tree
    (bitwise no-op on healthy steps)."""
    if not cfg.skip_nonfinite_updates:
        return new_stats
    from jax.flatten_util import ravel_pytree
    ok = jnp.all(jnp.isfinite(ravel_pytree(new_stats)[0]))
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_stats, old_stats)


def train_step(state: TrainState, batch, key, model: DISYolo,
               tx: optax.GradientTransformation):
    batch = prepare_batch(batch)
    keys = jax.random.split(key, batch["images"].shape[0])
    grads, new_stats, metrics = grads_and_aux(
        state.params, state.batch_stats, batch, keys, model)
    new_stats = _guard_stats(model.cfg, new_stats, state.batch_stats)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics


def _build_step_fn(model: DISYolo, tx: optax.GradientTransformation,
                   mesh: Mesh = None, dp_axis: str = "dp"):
    """Unjitted ``(state, batch, key) -> (state, metrics)`` step callable.

    Shared by ``make_jitted_train_step`` (one step per dispatch) and
    ``make_jitted_multi_step`` (K steps per dispatch under ``lax.scan``);
    see the former for the full design notes on the mesh variant.
    """
    cfg = model.cfg
    if cfg.device_side_augs:
        from dis_yolo_tpu.data.device_augment import augment_batch

    if mesh is None:
        base_step = functools.partial(train_step, model=model, tx=tx)
        if cfg.device_side_augs:
            def step_fn(state, batch, key):
                ka, kb = jax.random.split(key)
                batch = prepare_batch(batch)
                batch = augment_batch(ka, batch, cfg.image_size,
                                      flips=cfg.flipped,
                                      photometric=cfg.blur_noise_light)
                return base_step(state, batch, kb)
        else:
            step_fn = base_step
        return step_fn

    from jax.flatten_util import ravel_pytree

    # sync-BN: batch moments pmean'd over dp -> exact global-batch stats
    model_sync = model.clone(cfg=cfg.replace(bn_axis=dp_axis))

    def local_step(state, batch, keys, akey):
        batch = prepare_batch(batch)
        if cfg.device_side_augs:
            akey = jax.random.fold_in(akey, jax.lax.axis_index(dp_axis))
            batch = augment_batch(akey, batch, cfg.image_size,
                                  flips=cfg.flipped,
                                  photometric=cfg.blur_noise_light)
        # grad_accum splits the *per-device* batch; the pmean below still
        # happens exactly once, after accumulation
        grads, new_stats, metrics = grads_and_aux(
            state.params, state.batch_stats, batch, keys, model_sync)
        new_stats = _guard_stats(cfg, new_stats, state.batch_stats)
        flat, unravel = ravel_pytree(grads)
        mleaves, mdef = jax.tree.flatten(metrics)
        packed = jnp.concatenate(
            [flat, jnp.stack([m.astype(flat.dtype) for m in mleaves])])
        # the ONE unordered cross-device collective of the whole module
        packed = jax.lax.pmean(packed, dp_axis)
        grads = unravel(packed[:flat.size])
        metrics = jax.tree.unflatten(
            mdef, [packed[flat.size + i] for i in range(len(mleaves))])
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_stats, new_opt, state.step + 1),
                metrics)

    # check_vma=False: the device-side augment path closes over constant
    # tables (motion-blur kernels, HLS LUTs) inside lax.switch branches;
    # jax's varying-manual-axes checker rejects those invariant constants
    # meeting dp-varying operands (pvary error) even though the math is
    # per-device and correct.  The rest of the step was authored under the
    # checker and keeps exactly ONE collective (the fused pmean below).
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(dp_axis), P(dp_axis), P()),
        out_specs=(P(), P()), check_vma=False)

    def sharded_step(state, batch, key):
        if cfg.device_side_augs:
            akey, key = jax.random.split(key)
        else:
            akey = key  # unused inside
        keys = jax.random.split(key, batch["images"].shape[0])
        return sharded(state, batch, keys, akey)

    return sharded_step


def make_jitted_train_step(model: DISYolo, tx: optax.GradientTransformation,
                           mesh: Mesh = None, dp_axis: str = "dp",
                           donate: bool = False):
    """Compile the train step.

    ``donate=True`` donates the input ``TrainState`` buffers to the
    update (params / Adam moments / BN stats are written in place instead
    of double-buffered — ~2x less optimizer-state HBM).  The caller's
    state arrays are dead after the call, so only enable it for a
    ``state = step(state, ...)`` loop (the Solver does); parity tests
    that compare old vs new params must keep the default.

    The mesh variant is explicit SPMD: the whole step (forward, backward,
    optimizer) runs per-device under ``shard_map`` with the batch sharded
    over ``dp_axis``, and the module contains exactly ONE unordered
    collective — a single pmean of the flattened (grads, metrics) vector.
    BatchNorm moments are pmean'd inside the forward (sync-BN via
    ``cfg.bn_axis``), which keeps training semantics identical to a single
    device computing the global batch; those collectives form a data-
    dependency chain through the network, so they can never be reordered
    against each other.

    Why not GSPMD auto-partitioning (round-2 design): the partitioner
    emits one all-reduce per parameter gradient — ~50 collectives with no
    mutual data dependencies.  XLA:CPU's in-process collective runtime
    executes thunks out of order (SplitReadyQueue), so two virtual devices
    can block at *different* rendezvous and deadlock — which is exactly
    what the driver's 8-virtual-device dry run hit on a 1-core host.  On
    real TPU meshes the single fused gradient all-reduce is also the
    bandwidth-optimal shape (one launch, full ICI payload) rather than ~50
    small ones.
    """
    step_fn = _build_step_fn(model, tx, mesh=mesh, dp_axis=dp_axis)
    kw = dict(donate_argnums=(0,) if donate else ())
    if mesh is not None:
        kw["out_shardings"] = NamedSharding(mesh, P())
    return jax.jit(step_fn, **kw)


def make_jitted_multi_step(model: DISYolo, tx: optax.GradientTransformation,
                           mesh: Mesh = None, dp_axis: str = "dp",
                           donate: bool = True):
    """K-steps-per-dispatch training block: ``lax.scan`` of the train step.

    The reference hot loop — and round 1-4 of this rebuild — dispatches one
    step per Python iteration (``sess.run`` at train_yolo3_mask.py:158/216).
    On a network-attached chip every dispatch pays the host link RTT plus a
    host-side ``jax.random.split``, which measured 20-24x the 10.65 ms
    device step (BENCHMARKS "Reference schedule").  This variant compiles
    ONE program that advances K steps over a stacked batch block:

      ``(state, batches[K,B,...], rng) -> (state, rng, metrics[K])``

    * RNG parity: the scan body performs ``rng, key = jax.random.split(rng)``
      per step — the exact host-side protocol of ``Solver.train`` — so the
      K-block trajectory reproduces the per-step path seed-for-seed.
    * The compact wire format stays compact in HBM: ``prepare_batch``
      (uint8 -> f32, bit-unpack) runs inside each scan iteration, so only
      one step's expanded batch is ever live.
    * Metrics come back stacked ``[K]`` per key — one host fetch per block
      serves every ``summary_iter`` log row inside it.
    * Donation: state and the carried rng are donated (their buffers match
      the outputs one-for-one, so XLA updates them in place).  The batch
      block is NOT donated — a [K,B,...] input matches no output shape, so
      its donation could never be honored; its buffers die with the host
      reference after the call anyway.

    K is implicit in the leading dim of ``batches`` (one compile per
    distinct block length; the Solver snaps K to divide ``save_iter`` so
    only the final sub-``save_iter`` tail can add a second shape).
    """
    step_fn = _build_step_fn(model, tx, mesh=mesh, dp_axis=dp_axis)

    def multi(state, batches, rng):
        def body(carry, bat):
            st, r = carry
            r, key = jax.random.split(r)
            st, metrics = step_fn(st, bat, key)
            return (st, r), metrics

        (state, rng), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, rng, metrics

    kw = dict(donate_argnums=(0, 2) if donate else ())
    if mesh is not None:
        kw["out_shardings"] = (NamedSharding(mesh, P()),) * 3
    return jax.jit(multi, **kw)


def make_jitted_corpus_multi_step(model: DISYolo,
                                  tx: optax.GradientTransformation,
                                  mesh: Mesh = None, dp_axis: str = "dp",
                                  donate: bool = True):
    """K-step block over a DEVICE-RESIDENT corpus (data/device_corpus.py).

    ``(state, corpus, params[K,...], rng) -> (state, rng, metrics[K])``

    Same scan protocol as ``make_jitted_multi_step`` (per-step
    ``jax.random.split`` for seed parity with the host-driven loop), but
    each scan iteration assembles its batch ON DEVICE from the resident
    corpus — the host ships ~1 KB of indices + placement decisions per
    step instead of megabytes of pixels, so the wall floor is the device
    step, not the host link.  The corpus argument is NOT donated: it is
    read every step and survives across blocks.

    Mesh variant: the corpus is replicated (every device holds the
    dataset — it is read-only and a few hundred MB), the per-step param
    arrays shard over ``dp_axis`` with the batch, and assembly runs under
    GSPMD (sharding constraints pin its outputs to the batch sharding) so
    each device gathers and assembles only ITS examples before the
    ``shard_map`` train step consumes them.
    """
    from dis_yolo_tpu.data.device_corpus import make_assemble_fn
    assemble = make_assemble_fn(model.cfg)
    step_fn = _build_step_fn(model, tx, mesh=mesh, dp_axis=dp_axis)

    def multi(state, corpus, params, rng):
        def body(carry, p):
            st, r = carry
            r, key = jax.random.split(r)
            batch = assemble(corpus, p)
            if mesh is not None:
                shard = NamedSharding(mesh, P(dp_axis))
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, shard),
                    batch)
            st, metrics = step_fn(st, batch, key)
            return (st, r), metrics

        (state, rng), metrics = jax.lax.scan(body, (state, rng), params)
        return state, rng, metrics

    kw = dict(donate_argnums=(0, 3) if donate else ())
    if mesh is not None:
        kw["out_shardings"] = (NamedSharding(mesh, P()),) * 3
    return jax.jit(multi, **kw)
