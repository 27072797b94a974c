"""Position-sensitive mask assembly as a closed-form grid computation.

The reference builds, per box, k*k binary cell maps with dynamic-shape
``tf.zeros``/``tf.concat`` under ``tf.map_fn`` (``assemble_kmask_from_box``,
yolo3_net_pos.py:799-839 training path, :884-923 inference path) and reduces
``sum_k scoremap_k * cellmask_k``.  Here the same math is a gather:

  * the box (already rounded to score-map pixels) is split into k bins per
    axis with grid lines  g0=y1, g_i=round(y1 + i*(y2-y1)/k), g_k=y2
    (round = ties-to-even, matching tf.round / np.around);
  * pixel (r, c) belongs to row-bin  sum_i [r >= g_i, i=1..k-1]  and is
    inside iff g0 <= r < g_k  (same for columns);
  * the assembled logit at (r, c) is scoremap[r, c, row_bin*k + col_bin]
    masked by the inside indicator — identical to the one-hot cell-mask
    contraction but bandwidth-optimal (one gather instead of k^2 products).

Everything is fixed-shape and vmapped over (boxes, batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid_lines(lo: jnp.ndarray, hi: jnp.ndarray, k: int) -> jnp.ndarray:
    """Bin edges [k+1] for one axis; lo/hi are already-rounded floats."""
    sub = (hi - lo) / k
    inner = [jnp.round(lo + i * sub) for i in range(1, k)]
    return jnp.stack([lo] + inner + [hi]).astype(jnp.int32)


def bin_index_1d(size: int, lines: jnp.ndarray, k: int):
    """Per-pixel bin id [size] plus inside indicator [size] for one axis."""
    pos = jnp.arange(size, dtype=jnp.int32)
    # bin = number of interior grid lines <= pos, clamped to k-1 bins
    b = jnp.zeros((size,), jnp.int32)
    for i in range(1, k):
        b = b + (pos >= lines[i]).astype(jnp.int32)
    inside = (pos >= lines[0]) & (pos < lines[k])
    return jnp.minimum(b, k - 1), inside


def assemble_mask_single(scoremap: jnp.ndarray, box_yxyx_px: jnp.ndarray,
                         k: int) -> jnp.ndarray:
    """Assemble one instance-mask logit map.

    scoremap: [S, S, k*k]; box_yxyx_px: [4] float, already rounded to pixel
    units of the score map.  Returns [S, S] logits (zero outside the box).
    """
    s = scoremap.shape[0]
    gy = _grid_lines(box_yxyx_px[0], box_yxyx_px[2], k)
    gx = _grid_lines(box_yxyx_px[1], box_yxyx_px[3], k)
    row_bin, row_in = bin_index_1d(s, gy, k)
    col_bin, col_in = bin_index_1d(s, gx, k)
    kidx = row_bin[:, None] * k + col_bin[None, :]                   # [S,S]
    inside = (row_in[:, None] & col_in[None, :])
    picked = jnp.take_along_axis(scoremap, kidx[:, :, None], axis=-1)[..., 0]
    return jnp.where(inside, picked, 0.0)


def box_inside_mask(box_yxyx_px: jnp.ndarray, size: int) -> jnp.ndarray:
    """Inside-box indicator [S, S] = sum of all k^2 cell masks.

    Used by the mask loss (`mask_object`, yolo3_net_pos.py:848) to restrict
    BCE to the box interior and normalize by its area.
    """
    pos = jnp.arange(size, dtype=jnp.float32)
    rows = (pos >= box_yxyx_px[0]) & (pos < box_yxyx_px[2])
    cols = (pos >= box_yxyx_px[1]) & (pos < box_yxyx_px[3])
    return (rows[:, None] & cols[None, :]).astype(jnp.float32)


def assemble_masks(scoremap: jnp.ndarray, boxes_norm: jnp.ndarray,
                   k: int) -> jnp.ndarray:
    """Assemble logits for a padded set of boxes of one image.

    scoremap: [S, S, k*k]; boxes_norm: [D, 4] normalized yxyx (padding rows
    are all-zero and yield empty masks).  Returns [D, S, S] logits.

    Matches the reference's `tf.round(boxes * size)` quantization
    (yolo3_net_pos.py:842, :876).
    """
    s = scoremap.shape[0]
    boxes_px = jnp.round(boxes_norm.astype(jnp.float32) * s)
    return jax.vmap(lambda b: assemble_mask_single(scoremap, b, k))(boxes_px)


def assemble_masks_batch(scoremaps: jnp.ndarray, boxes_norm: jnp.ndarray,
                         k: int, apply_sigmoid: bool = True) -> jnp.ndarray:
    """Batched inference-path assembly: [B,S,S,k*k] + [B,D,4] -> [B,D,S,S].

    With ``apply_sigmoid`` this reproduces `val_test`'s per-image
    assemble+sigmoid (yolo3_net_pos.py:925-928) without its ragged output
    lists: padded boxes simply produce all-zero (sigmoid: 0.5 * 0 = masked
    later by validity) rows that callers drop via box validity.
    """
    out = jax.vmap(lambda sm, bx: assemble_masks(sm, bx, k))(scoremaps, boxes_norm)
    if apply_sigmoid:
        out = jax.nn.sigmoid(out)
    return out
