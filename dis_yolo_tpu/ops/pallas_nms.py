"""Pallas TPU kernel: fused class-aware greedy NMS.

Fuses the suppression-matrix construction and the ``max_detection``
select-and-suppress rounds of ``ops.nms._select_suppress_nms`` into one
kernel: the K x K IoU/suppression matrix lives in VMEM scratch (1 MB at
K=512) and never touches HBM, and each round is an argmax + row-mask on
the VPU.  Outputs the picked candidate indices [max_det] (-1 padding),
identical to the jnp path.

Semantics note (same as the jnp path): candidates are pre-sorted by
descending score, so the argmax tie-break (lowest index) matches greedy
order deterministically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, classes_ref, valid_ref, out_ref,
                sup_ref, alive_ref, *, k: int, max_det: int,
                iou_thresh: float):
    y1 = boxes_ref[:, 0:1]                                # [K,1]
    x1 = boxes_ref[:, 1:2]
    y2 = boxes_ref[:, 2:3]
    x2 = boxes_ref[:, 3:4]

    iy1 = jnp.maximum(y1, y1.T)
    ix1 = jnp.maximum(x1, x1.T)
    iy2 = jnp.minimum(y2, y2.T)
    ix2 = jnp.minimum(x2, x2.T)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    area = (y2 - y1) * (x2 - x1)                          # [K,1]
    union = area + area.T - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    same_class = classes_ref[:, 0:1] == classes_ref[:, 0:1].T
    sup_ref[:, :] = ((iou > iou_thresh) & same_class).astype(jnp.float32)

    alive_ref[:, :] = valid_ref[:, :].astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def round_body(d, _):
        alive = alive_ref[:, :]
        s = jnp.where(alive > 0, scores_ref[:, :], -jnp.inf)  # [K,1]
        best = jnp.max(s)
        # lowest index attaining the max (stable tie-break)
        j = jnp.min(jnp.where(s == best, idx, k))
        ok = best > -jnp.inf
        sup_row = sup_ref[pl.ds(j, 1), :]                 # [1,K] dynamic ref read
        new_alive = alive * (1.0 - sup_row.T) * (idx != j)
        alive_ref[:, :] = jnp.where(ok, new_alive, jnp.zeros_like(alive))
        out_ref[d, 0] = jnp.where(ok, j, -1)
        return _

    jax.lax.fori_loop(0, max_det, round_body, 0)


@functools.partial(jax.jit, static_argnames=("max_det", "iou_thresh", "interpret"))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, classids: jnp.ndarray,
               valid: jnp.ndarray, max_det: int = 30, iou_thresh: float = 0.3,
               interpret: bool = False) -> jnp.ndarray:
    """boxes [K,4] yxyx (score-sorted desc), scores [K], classids [K],
    valid [K] -> picked indices [max_det] (-1 padded)."""
    k = boxes.shape[0]
    kernel = functools.partial(_nms_kernel, k=k, max_det=max_det,
                               iou_thresh=iou_thresh)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((max_det, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar index writes
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),     # suppression matrix
            pltpu.VMEM((k, 1), jnp.float32),     # alive mask
        ],
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32)[:, None],
      classids.astype(jnp.int32)[:, None], valid.astype(jnp.float32)[:, None])
    return out[:, 0]
