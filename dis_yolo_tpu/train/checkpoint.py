"""Checkpointing: Orbax save/restore + TF1 scope-name weight bridge.

Replaces tf.train.Saver (train_yolo3_mask.py:47-58, max_to_keep=None, saved
every SAVE_ITER) with Orbax.  Two restore modes mirror the reference:

  * stage-1 selective: backbone + detection-head conv_bn layers
    {1-52, 53-58, 60-66, 68-74} and bias convs {59, 67, 75} from a
    pretrained checkpoint, mask subnet (76-82) left at init
    (train_yolo3_mask.py:75-107, ignore_missing_vars=True)
  * stage-2 full: every layer (train_yolo3_mask.py:61,109-111)

``tf1_name_map`` documents the exact TF scope-name correspondence
(yolo/convolutionalN/{weights,biases,BatchNorm/{beta,gamma,moving_mean,
moving_variance}}) so the published ``yolov3_3class_coco.ckpt`` can be
converted when TensorFlow is available (convert_tf1_checkpoint).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

# Layers restored in stage 1 (train_yolo3_mask.py:77-103)
STAGE1_CONV_BN = tuple(range(1, 53)) + tuple(range(53, 59)) + \
    tuple(range(60, 67)) + tuple(range(68, 75))
STAGE1_CONV_BIAS = (59, 67, 75)


# One long-lived checkpointer so saves are ASYNC across training steps:
# StandardCheckpointer.save copies device->host synchronously (so the
# arrays may be donated/mutated immediately after it returns) and runs
# the disk serialization on a background thread.  The blocking
# wait_until_finished moves to the *next* save (at most one in flight,
# and the interrupted-save rmtree below stays race-free) and to
# train()-exit via wait_for_checkpoints().
_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every async save has committed to disk."""
    for fut in list(_PENDING):
        fut.result()
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def is_primary() -> bool:
    """True on the process that owns host-side artifacts (logs, cleanup)."""
    return jax.process_index() == 0


def _sync(tag: str) -> None:
    """Cross-process barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


_SAVE_POOL = None
_PENDING: list = []


def save_checkpoint_background(ckpt_dir: str, state, step: int) -> str:
    """Snapshot-then-save: checkpoint WITHOUT blocking the train loop on
    the device->host state copy.

    Orbax's async saver still blocks the caller until the full TrainState
    has been copied off-device — on a network-attached chip that copy is
    the save interval's dominant term (396 MB at tunnel rates = 13-30 s
    measured, BENCHMARKS round 5).  Here the state is first cloned ON
    DEVICE (device-to-device, milliseconds, and it decouples the saved
    values from the live buffers the donated train step will overwrite),
    then a single background worker thread runs the ordinary
    ``save_checkpoint`` — its d2h copy rides the link WHILE subsequent
    train blocks execute (in corpus mode the loop ships ~1 KB/step, so
    the link is otherwise idle).  Single-process only: the multi-host
    path keeps the synchronous call because Orbax's coordination barriers
    must run on the main thread of every process.

    The reference has no analog — ``tf.train.Saver.save`` is fully
    synchronous (train_yolo3_mask.py:208).
    """
    if jax.process_count() > 1:
        return save_checkpoint(ckpt_dir, state, step)
    global _SAVE_POOL
    if _SAVE_POOL is None:
        import concurrent.futures
        _SAVE_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt_save")
    snap = _snapshot(state)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    fut = _SAVE_POOL.submit(save_checkpoint, ckpt_dir, snap, step, True)
    _PENDING.append(fut)
    fut.add_done_callback(lambda f: _PENDING.remove(f))
    return path


_SNAP_JIT = None


def _snapshot(state):
    """Device-side clone of a whole pytree in ONE dispatch.

    A per-leaf ``jnp.array(copy=True)`` loop costs one host->device round
    trip per leaf — ~200 leaves x ~30 ms tunnel RTT = ~6 s measured inside
    the save-interval gap.  One jitted tree-copy program pays a single
    dispatch; ``x.copy()`` is a real HLO copy (not a passthrough), so the
    outputs are fresh buffers decoupled from the live donated state.
    """
    global _SNAP_JIT
    if _SNAP_JIT is None:
        _SNAP_JIT = jax.jit(
            lambda t: jax.tree.map(lambda x: x.copy(), t))
    return _SNAP_JIT(state)


def save_checkpoint(ckpt_dir: str, state, step: int, wait: bool = False) -> str:
    """Save the full TrainState (resume) plus a weights-only artifact
    (params + batch_stats) usable across stage configs whose optimizer
    trees differ (stage-1 vs stage-2 trainable masks).

    Multi-host safe: EVERY process must call this (Orbax coordinates the
    write — each process serializes its addressable shards, the primary
    writes metadata and commits the directory atomically); the manual
    interrupted-save cleanup runs on the primary only, behind a barrier so
    no process starts writing into a directory being removed.

    Returns once the data is safely copied off-device; the disk write
    completes in the background unless ``wait=True``."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # previous async save, if still in flight
    if is_primary() and os.path.isdir(path):  # re-run over an interrupted save
        import shutil
        shutil.rmtree(path)
    _sync(f"ckpt_cleanup_{step}")
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.save(os.path.join(path, "weights"),
               {"params": state.params, "batch_stats": state.batch_stats})
    if wait:
        ckptr.wait_until_finished()
    return path


def prune_checkpoints(ckpt_dir: str, keep: int,
                      protect: Tuple[int, ...] = ()) -> None:
    """Delete all but the newest ``keep`` step_* checkpoints (primary-only).

    The reference keeps every checkpoint (max_to_keep=None,
    train_yolo3_mask.py:58) — that is the default (``cfg.max_keep_ckpt=0``
    = never prune); long 576^2 runs saving ~1 GB of Adam state every 500
    steps opt into pruning.  ``protect`` lists step numbers that survive
    pruning regardless of age — the Solver passes the best-validation
    step, so the deployable peak checkpoint outlives the rolling window.
    """
    if keep <= 0 or not is_primary() or not os.path.isdir(ckpt_dir):
        return
    import shutil
    keep_names = {f"step_{s:08d}" for s in protect}
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    for d in steps[:-keep]:
        if d not in keep_names:
            shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def mark_best(ckpt_dir: str, step: int, map50: float) -> None:
    """Record the best-validation checkpoint (primary-only ``best.json``).

    The reference keeps *every* checkpoint and dumps the 800x9 ``val_map``
    array (train_yolo3_mask.py:58,221-227) precisely so the user can pick
    the peak-val checkpoint for test evaluation by hand; this automates
    that selection (the round-4 schedule run showed why: final mAP50
    0.750 vs peak 0.796).
    """
    if not is_primary():
        return
    import json
    with open(os.path.join(ckpt_dir, "best.json"), "w") as f:
        json.dump({"step": int(step), "mAP": float(map50)}, f)


def read_best(ckpt_dir: str) -> Optional[dict]:
    """{'step', 'mAP'} of the tracked best-val checkpoint, or None."""
    import json
    path = os.path.join(ckpt_dir, "best.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the best-validation checkpoint if it exists on disk."""
    best = read_best(ckpt_dir)
    if best is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{best['step']:08d}")
    return path if os.path.isdir(path) else None


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_checkpoint(path: str, target):
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, "state")
    if os.path.isdir(state_path):
        return ckptr.restore(state_path, target=target)
    return ckptr.restore(path, target=target)  # pre-split layout


def restore_weights(path: str, params, batch_stats):
    """Load only {params, batch_stats} from a checkpoint (stage bridge)."""
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.join(path, "weights"),
                        target={"params": params, "batch_stats": batch_stats})
    return out["params"], out["batch_stats"]


# ---------------------------------------------------------------------------
# TF1 bridge
# ---------------------------------------------------------------------------

def tf1_name_map(layer_id: int, has_bn: bool) -> Dict[str, str]:
    """Flax param path suffix -> TF1 variable name for one conv layer."""
    scope = f"yolo/convolutional{layer_id}"
    if has_bn:
        return {
            "conv/kernel": f"{scope}/weights",
            "bn/scale": f"{scope}/BatchNorm/gamma",
            "bn/bias": f"{scope}/BatchNorm/beta",
            "bn/mean": f"{scope}/BatchNorm/moving_mean",
            "bn/var": f"{scope}/BatchNorm/moving_variance",
        }
    return {
        "conv/kernel": f"{scope}/weights",
        "conv/bias": f"{scope}/biases",
    }


def load_tf1_weights(variables: Dict[str, Any], tf1_values: Dict[str, np.ndarray],
                     layers: Optional[Iterable[int]] = None,
                     ignore_missing: bool = True) -> Dict[str, Any]:
    """Merge a {tf1_name: ndarray} dict into Flax variables.

    ``layers=None`` restores every conv layer present (stage-2 full
    restore); pass STAGE1_CONV_BN + STAGE1_CONV_BIAS ids for the stage-1
    selective restore.  TF kernels are HWIO like Flax's — no transpose.
    """
    params = jax.tree.map(lambda x: x, variables["params"])
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])

    wanted = set(layers) if layers is not None else None
    for name, layer in params.items():
        if not name.startswith("convolutional"):
            continue
        lid = int(name[len("convolutional"):])
        if wanted is not None and lid not in wanted:
            continue
        has_bn = "bn" in layer
        for flax_key, tf_name in tf1_name_map(lid, has_bn).items():
            if tf_name not in tf1_values:
                if ignore_missing:
                    continue
                raise KeyError(tf_name)
            val = np.asarray(tf1_values[tf_name])
            parts = flax_key.split("/")
            if parts[0] == "conv":
                dst = layer["conv"]
                ref = dst[parts[1]]
                assert ref.shape == val.shape, (tf_name, ref.shape, val.shape)
                dst[parts[1]] = val.astype(np.asarray(ref).dtype)
            else:  # bn
                if parts[1] in ("scale", "bias"):
                    dst = layer["bn"]
                else:
                    dst = stats[name]["bn"]
                ref = dst[parts[1]]
                assert ref.shape == val.shape, (tf_name, ref.shape, val.shape)
                dst[parts[1]] = val.astype(np.asarray(ref).dtype)
    return {"params": params, "batch_stats": stats}


def export_tf1_weights(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax {params, batch_stats} -> {tf1_scope_name: ndarray}.

    Inverse of ``load_tf1_weights``: emits the reference's variable names
    (``yolo/convolutionalN/{weights,biases,BatchNorm/*}``,
    train_yolo3_mask.py:87-101).  Used to publish reference-compatible
    weight dumps and to stand in for the unavailable pretrained
    ``yolov3_3class_coco`` download (self-pretrained backbone artifacts).
    """
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    stats = variables["batch_stats"]
    for name, layer in params.items():
        if not name.startswith("convolutional"):
            continue
        lid = int(name[len("convolutional"):])
        has_bn = "bn" in layer
        for flax_key, tf_name in tf1_name_map(lid, has_bn).items():
            parts = flax_key.split("/")
            if parts[0] == "conv":
                out[tf_name] = np.asarray(layer["conv"][parts[1]])
            elif parts[1] in ("scale", "bias"):
                out[tf_name] = np.asarray(layer["bn"][parts[1]])
            else:
                out[tf_name] = np.asarray(stats[name]["bn"][parts[1]])
    return out


def convert_tf1_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read a TF1 .ckpt into {name: ndarray} — no TensorFlow required.

    The default (V2 / TensorBundle) format written by ``tf.train.Saver``
    — the format of the published ``yolov3_3class_coco.ckpt``
    (train_yolo3_mask.py:104-107) — is parsed natively by
    ``train/tensorbundle.py`` (pure numpy SSTable + protobuf reader).
    Only the pre-TF-0.12 single-file V1 format still needs TensorFlow,
    and only as an optional fallback.
    """
    import os
    from dis_yolo_tpu.train.tensorbundle import read_tensor_bundle
    if os.path.isfile(ckpt_path + ".index"):
        return read_tensor_bundle(ckpt_path)
    if not os.path.isfile(ckpt_path):
        # fail fast with the real problem before the V1 fallback can
        # surface TensorFlow's opaque TensorSliceReader error
        raise FileNotFoundError(
            f"{ckpt_path}: no such checkpoint — expected a TensorBundle "
            f"(V2) pair ({ckpt_path}.index + .data-*) or a V1 single file")
    try:  # V1 single-file checkpoints only (pre-2017 TF) — optional TF path
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"{ckpt_path}.index not found: not a TensorBundle (V2) "
            "checkpoint.  V1 single-file checkpoints need TensorFlow "
            "installed, or re-save once with a TF1 V2 saver.") from e
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def stage1_restore(variables, tf1_values):
    """Selective stage-1 restore (mask subnet stays at init)."""
    return load_tf1_weights(variables, tf1_values,
                            layers=set(STAGE1_CONV_BN) | set(STAGE1_CONV_BIAS),
                            ignore_missing=True)


# ---------------------------------------------------------------------------
# Darknet bridge
# ---------------------------------------------------------------------------

def read_darknet_weights(path: str, variables: Dict[str, Any],
                         source_classes: Optional[int] = 80
                         ) -> Dict[str, np.ndarray]:
    """Parse a darknet ``yolov3.weights`` binary into {tf1_name: ndarray}.

    Covers the reference README's custom-dataset step 2 ("download the
    pretrained yolov3.weights and convert it to a .ckpt file ... manually
    crop the last class prediction channel") natively: the YOLOv3 layers
    conv1-75 are serialized in the file exactly in this model's ascending
    conv order (darknet cfg order == the reference's TF1 scope numbering),
    each layer as [bn beta, gamma, moving_mean, moving_var | conv bias]
    then the OIHW kernel, after a 5-int32-word header.

    ``source_classes``: class count the .weights was trained for (80 for
    the stock COCO release). When it differs from this model's, the three
    detection convs (59/67/75) are cropped per anchor — block layout
    [x,y,w,h,obj,cls...] — keeping the first ``num_class`` class channels,
    which is the README's manual crop. Pass None to require exact shapes.

    ``variables`` may hold arrays or ShapeDtypeStructs (only shapes are
    read) — use ``jax.eval_shape(api.init_variables, ...)`` to avoid a
    full init. Returns a dict consumable by ``load_tf1_weights`` /
    ``stage1_restore``; mask-subnet layers (76+) have no darknet
    counterpart and are absent.
    """
    params = variables["params"]
    with open(path, "rb") as f:
        major, minor = np.fromfile(f, np.int32, 2)
        np.fromfile(f, np.int32, 1)                      # revision
        # images-seen counter: int64 from format 0.2, int32 before
        if int(major) * 10 + int(minor) >= 2:
            np.fromfile(f, np.int64, 1)
        else:
            np.fromfile(f, np.int32, 1)
        buf = np.fromfile(f, np.float32)

    pos = 0

    def take(n: int, what: str) -> np.ndarray:
        nonlocal pos
        if pos + n > buf.size:
            raise ValueError(
                f"darknet file truncated at {what}: need {n} floats, "
                f"{buf.size - pos} left — wrong architecture or classes?")
        out = buf[pos:pos + n]
        pos += n
        return out

    values: Dict[str, np.ndarray] = {}
    for lid in range(1, 76):
        layer = params[f"convolutional{lid}"]
        has_bn = "bn" in layer
        kh, kw, cin, cout = layer["conv"]["kernel"].shape
        file_cout = cout
        crop = None
        if not has_bn and source_classes is not None:
            # detection conv: 3 anchors x (5 + classes) output channels
            per_anchor = cout // 3
            num_class = per_anchor - 5
            if num_class != source_classes:
                if num_class > source_classes:
                    raise ValueError(
                        f"model has {num_class} classes but the .weights "
                        f"file only {source_classes}; cropping cannot "
                        "invent channels — restore the backbone only")
                file_cout = 3 * (5 + source_classes)
                crop = (per_anchor, 5 + source_classes)
        names = tf1_name_map(lid, has_bn)
        if has_bn:
            beta = take(cout, f"conv{lid} bn beta")
            gamma = take(cout, f"conv{lid} bn gamma")
            mean = take(cout, f"conv{lid} bn mean")
            var = take(cout, f"conv{lid} bn var")
            values[names["bn/bias"]] = beta.copy()
            values[names["bn/scale"]] = gamma.copy()
            values[names["bn/mean"]] = mean.copy()
            values[names["bn/var"]] = var.copy()
        else:
            bias = take(file_cout, f"conv{lid} bias")
            if crop:
                bias = bias.reshape(3, crop[1])[:, :crop[0]].reshape(-1)
            values[names["conv/bias"]] = bias.copy()
        kernel = take(file_cout * cin * kh * kw, f"conv{lid} kernel")
        kernel = kernel.reshape(file_cout, cin, kh, kw)      # darknet OIHW
        if crop:
            kernel = (kernel.reshape(3, crop[1], cin, kh, kw)[:, :crop[0]]
                      .reshape(3 * crop[0], cin, kh, kw))
        values[names["conv/kernel"]] = (
            kernel.transpose(2, 3, 1, 0).copy())             # -> HWIO
    if pos != buf.size:
        raise ValueError(
            f"darknet file has {buf.size - pos} unread floats after "
            f"conv75 — source_classes={source_classes} wrong, or not a "
            "YOLOv3 .weights file")
    return values
