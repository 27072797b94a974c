"""High-level model API: init / forward / end-to-end predict.

``predict`` is the TPU-native equivalent of the reference's
``net.evaluation`` fetch (yolo3_net_pos.py:65 -> val_test :862-938): one
jittable function taking a letterboxed image batch and per-image clip
windows, returning fixed-shape padded detections and assembled sigmoid
masks (validity = nonzero detection rows).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models.dis_yolo import DISYolo
from dis_yolo_tpu.ops import mask_assembly, nms
from dis_yolo_tpu.ops.decode import decode_all


def create_model(cfg: DISYoloConfig) -> DISYolo:
    return DISYolo(cfg=cfg)


def init_variables(cfg: DISYoloConfig, rng: jax.Array,
                   image_size: Optional[int] = None) -> Dict[str, Any]:
    """Initialize {params, batch_stats}; shapes are resolution-independent."""
    size = image_size or cfg.image_size
    model = create_model(cfg)
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    return model.init(rng, dummy, train=False)


def forward(model: DISYolo, variables: Dict[str, Any], images: jnp.ndarray,
            train: bool = False):
    """Raw network outputs; in train mode also returns updated batch_stats."""
    if train:
        out, mutated = model.apply(variables, images, train=True,
                                   mutable=["batch_stats"])
        return out, mutated["batch_stats"]
    return model.apply(variables, images, train=False)


def predict(model: DISYolo, variables: Dict[str, Any], images: jnp.ndarray,
            windows: jnp.ndarray, obj_thresh: Optional[float] = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full inference: images [B,H,W,3], windows [B,4] ->
    (detections [B,D,6] zero-padded, masks [B,D,S,S] sigmoid probabilities).
    """
    raws = forward(model, variables, images, train=False)
    return predict_from_outputs(model.cfg, raws, windows, obj_thresh)


def predict_from_outputs(cfg: DISYoloConfig, raws, windows: jnp.ndarray,
                         obj_thresh: Optional[float] = None,
                         pallas: Optional[bool] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The post-forward half of ``predict``: raw head outputs -> detections
    + assembled masks.  Split out so the composed inference chain
    ``interpret_output -> filter_detections -> val_test``
    (yolo3_net_pos.py:465-628, :862-938) can be parity-tested end to end
    against a literal numpy oracle from identical raw tensors
    (tests/test_composed_oracle.py).

    ``pallas`` pins the assembly formulation explicitly (the default sniffs
    the host backend at trace time — wrong when lowering for a *different*
    platform, e.g. jax.export cross-platform artifacts, export.py)."""
    # the mask-assembly pixel quantization is square-only, exactly like the
    # reference's val_test which uses shape[1] for both axes
    # (yolo3_net_pos.py:873); letterbox non-square inputs first.
    assert raws[3].shape[1] == raws[3].shape[2], (
        "predict requires square inputs (letterbox first); got score maps "
        f"{raws[3].shape}")
    preds = decode_all(raws[:3], cfg)
    dets = nms.filter_detections(preds, windows, cfg, obj_thresh)
    # drop degenerate boxes whose rounded score-map extent is non-positive
    # (val_test's keep_ix, yolo3_net_pos.py:876-880)
    s = raws[3].shape[1]
    boxes_px = jnp.round(dets[..., :4] * s)
    nondegenerate = ((boxes_px[..., 2] - boxes_px[..., 0] > 0)
                     & (boxes_px[..., 3] - boxes_px[..., 1] > 0))
    valid = jnp.any(dets[..., :4] != 0.0, axis=-1) & nondegenerate
    dets = dets * valid[..., None]
    if pallas is None:
        pallas = cfg.use_pallas_assembly and _on_tpu()
    if pallas:
        # the kernel picks a VMEM-resident or spatially-tiled layout itself,
        # so even the stride-1 S=576 decoder stays on the fast path
        from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_batch_pallas
        masks = assemble_masks_batch_pallas(raws[3], dets[..., :4], cfg.k_map)
    else:
        masks = mask_assembly.assemble_masks_batch(raws[3], dets[..., :4],
                                                   cfg.k_map)
    masks = masks * valid[..., None, None]
    return dets, masks


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def make_jitted_predict(model: DISYolo, obj_thresh: Optional[float] = None,
                        mesh=None, dp_axis: str = "dp"):
    """Compile ``predict`` once; variables passed as an argument so folded /
    updated weights don't retrigger compilation.

    With a ``mesh``, the image/window batch is sharded over ``dp_axis`` and
    the weights replicated — multi-chip batched serving.  Outputs stay
    batch-sharded: the host fetches each addressable shard directly (no
    collective), and re-gathering [B,30,S,S] masks onto every chip would
    be pure wasted ICI bandwidth for a serving path whose next stop is the
    host (or the device-paste route, which is also per-image).
    """
    if mesh is None:
        @functools.partial(jax.jit, static_argnums=())
        def _run(variables, images, windows):
            return predict(model, variables, images, windows, obj_thresh)
        return _run

    from jax.sharding import NamedSharding, PartitionSpec as P
    bsh = NamedSharding(mesh, P(dp_axis))
    repl = NamedSharding(mesh, P())
    spec = P(dp_axis)

    @jax.jit
    def _run_dp(variables, images, windows):
        images = jax.lax.with_sharding_constraint(images, bsh)
        windows = jax.lax.with_sharding_constraint(windows, bsh)
        variables = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), variables)
        raws = forward(model, variables, images, train=False)
        # post-forward decode/NMS/assembly is strictly per-image: run it
        # device-locally under shard_map.  GSPMD auto-partitioning would
        # instead lower each vmapped lax.top_k (NMS shortlist, fixpoint
        # ordering) to an all-gather + replicated TopK — wasted wire bytes
        # on a real mesh and an unordered collective that can deadlock the
        # CPU in-process runtime (see train_step._per_image_roi_losses).
        # With sharded outputs this serving module contains ZERO
        # collectives, so no rendezvous can ever be mis-ordered.
        return jax.shard_map(
            lambda r, w: predict_from_outputs(model.cfg, r, w, obj_thresh),
            mesh=mesh, in_specs=(spec, spec), out_specs=spec)(raws, windows)

    return _run_dp
