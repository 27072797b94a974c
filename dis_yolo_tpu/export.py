"""AOT serving export: the jitted predict graph as a portable artifact.

The reference deploys by shipping TF1 checkpoints that the evaluation
script restores into a freshly rebuilt graph (calculate_test_map.py:182-185
via train_yolo3_mask.py's Saver var list) — deployment requires the full
model-building code.  The TPU-native analog is ``jax.export``: the entire
compiled inference program (forward -> decode -> NMS -> assembly -> sigmoid,
models/api.predict) is serialized as a StableHLO module with the
deploy-folded weights baked in as constants.  The artifact is
self-contained: loading and serving needs jax only — no dis_yolo_tpu model
code, no checkpoint restore, no Python graph rebuild.

Artifact layout (``<path>.stablehlo`` + ``<path>.json``):

- the serialized ``jax.export.Exported`` bytes
- a JSON sidecar with the config snapshot (the reference's ``config.txt``
  analog, train_yolo3_mask.py:229-235), input/output shapes, platforms and
  the producing jax version.

Pallas note: the mask-assembly kernel lowers to a ``tpu_custom_call`` —
not on StableHLO's forward-compatibility-guaranteed list, so exporting the
Pallas path pins the artifact to a compatible libtpu/mosaic (we opt in via
``DisabledSafetyCheck.custom_call``).  The jnp assembly formulation is
numerically identical (tests/test_pallas_assembly.py), so ``pallas=False``
(the default when exporting off-TPU) trades tail latency for a
forward-compatible artifact.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig

_FORMAT_VERSION = 1


def export_predict(cfg: DISYoloConfig, variables: Dict[str, Any],
                   batch_size: "int | str" = 1,
                   obj_thresh: Optional[float] = None,
                   platforms: Optional[Sequence[str]] = None,
                   pallas: Optional[bool] = None) -> "jax.export.Exported":
    """Trace + lower ``api.predict`` with the weights baked in.

    ``variables`` must match ``cfg`` (deploy-folded params for
    ``cfg.deploy=True``, quantized for ``cfg.quant=True``).  ``platforms``
    defaults to the current backend; pass e.g. ``("tpu", "cpu")`` for a
    multi-platform module (the Pallas path is then disabled — its custom
    call only exists on TPU).

    ``batch_size`` may be a symbolic-dimension string (e.g. ``"b"``): the
    artifact then serves ANY batch size — the analog of the reference
    graph's ``[None, ...]`` image placeholder (yolo3_net_pos.py:44).  The
    spatial size stays static (grids, anchor offsets and score-map shapes
    derive from it; the runtime re-jits per resolution instead, matching
    ``TEST_SIZE``, yolo/config.py:66).  The Pallas assembly kernel cannot
    lower under symbolic shapes, so symbolic exports pin ``pallas=False``
    (the jnp formulation is bit-identical — tests/test_pallas_assembly.py).
    """
    from dis_yolo_tpu.models import api

    platforms = tuple(platforms or (jax.default_backend(),))
    symbolic = isinstance(batch_size, str)
    if symbolic:
        if pallas:
            raise ValueError("pallas=True is incompatible with a symbolic "
                             "batch dim (the kernel's grid is shape-"
                             "specialized); use the jnp assembly")
        pallas = False
    if pallas is None:
        pallas = platforms == ("tpu",) and cfg.use_pallas_assembly
    if pallas and platforms != ("tpu",):
        raise ValueError("pallas=True requires platforms=('tpu',); the "
                         "kernel's tpu_custom_call has no CPU lowering")
    run_cfg = cfg.replace(use_pallas_assembly=pallas)
    model = api.create_model(run_cfg)

    def _serve(images, windows):
        raws = api.forward(model, variables, images, train=False)
        # pin the assembly formulation explicitly: api's default sniffs the
        # *host* backend at trace time, wrong when lowering for another
        # platform
        return api.predict_from_outputs(run_cfg, raws, windows, obj_thresh,
                                        pallas=pallas)

    size = cfg.test_size
    if symbolic:
        batch_size, = jax.export.symbolic_shape(batch_size)
    in_specs = (jax.ShapeDtypeStruct((batch_size, size, size, 3),
                                     jnp.float32),
                jax.ShapeDtypeStruct((batch_size, 4), jnp.float32))
    checks = ()
    if pallas:
        checks = (jax.export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call"),)
    return jax.export.export(jax.jit(_serve), platforms=list(platforms),
                             disabled_checks=list(checks))(*in_specs)


def save_artifact(exported: "jax.export.Exported", path: str,
                  cfg: DISYoloConfig, obj_thresh: Optional[float] = None,
                  extra_meta: Optional[Dict[str, Any]] = None) -> str:
    """Write ``<path>.stablehlo`` + ``<path>.json``; returns the blob path."""
    blob_path = path + ".stablehlo"
    os.makedirs(os.path.dirname(os.path.abspath(blob_path)), exist_ok=True)
    blob = exported.serialize()
    with open(blob_path, "wb") as f:
        f.write(bytes(blob))
    meta = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        # symbolic dims (shape-polymorphic batch) serialize as strings
        "in_shapes": [[d if isinstance(d, int) else str(d) for d in a.shape]
                      for a in exported.in_avals],
        "out_shapes": [[d if isinstance(d, int) else str(d) for d in a.shape]
                       for a in exported.out_avals],
        "obj_thresh": obj_thresh,
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in dataclasses.asdict(cfg).items()},
    }
    meta.update(extra_meta or {})
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return blob_path


def load_artifact(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load ``<path>.stablehlo``(+json) -> (jitted callable, meta dict).

    The callable is ``run(images [B,S,S,3] f32, windows [B,4] f32) ->
    (detections [B,D,6], masks [B,D,S',S'])`` with the exported shapes
    enforced by XLA.  Needs only jax — no model code, no weights.
    """
    with open(path + ".stablehlo", "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    meta: Dict[str, Any] = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return jax.jit(exported.call), meta
