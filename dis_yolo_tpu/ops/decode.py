"""Anchor decoding of raw YOLO head outputs (closed-form, iota offsets).

Parity target: reference ``interpret_output`` (yolo3_net_pos.py:465-514).
Scale index 0 is the stride-8 (largest grid / small objects) map, matching
the reference's ``yolos = [yolov3_3, yolov3_2, yolov3_1]`` ordering, so the
anchor slice for scale i is ``anchors[3*i : 3*i+3]``.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig


class ScalePrediction(NamedTuple):
    """Decoded predictions for one YOLO scale (all float32)."""

    conf_logit: jnp.ndarray       # [B, H, W, A, 1]
    class_logit: jnp.ndarray      # [B, H, W, A, C]
    coord: jnp.ndarray            # [B, H, W, A, 4] (sigmoid cx, cy, raw tw, th)
    norm_coord: jnp.ndarray       # [B, H, W, A, 4] (xc, yc, w, h in [0,1] units)
    anchors: jnp.ndarray          # [A, 2] pixel anchors for this scale


def cell_offsets(grid_h: int, grid_w: int) -> jnp.ndarray:
    """(x, y) cell-corner offsets: [1, H, W, 1, 2].

    Equivalent of the reference's precomputed tiled range grid
    (yolo3_net_pos.py:23-26) as a broadcasted iota.
    """
    xs = jnp.broadcast_to(jnp.arange(grid_w, dtype=jnp.float32)[None, :], (grid_h, grid_w))
    ys = jnp.broadcast_to(jnp.arange(grid_h, dtype=jnp.float32)[:, None], (grid_h, grid_w))
    return jnp.stack([xs, ys], axis=-1)[None, :, :, None, :]


def decode_scale(raw: jnp.ndarray, scale_idx: int, cfg: DISYoloConfig,
                 net_hw: Sequence[int]) -> ScalePrediction:
    """Decode one head output [B, H, W, A, 5+C] -> ScalePrediction."""
    raw = raw.astype(jnp.float32)
    grid_h, grid_w = raw.shape[1], raw.shape[2]
    net_h, net_w = net_hw
    a = cfg.anchors_per_scale

    conf_logit = raw[..., 4:5]
    class_logit = raw[..., 5:]
    pred_cxy = 1.0 / (1.0 + jnp.exp(-raw[..., :2]))                  # sigmoid
    pred_twh = raw[..., 2:4]
    coord = jnp.concatenate([pred_cxy, pred_twh], axis=-1)

    grid_factor = jnp.asarray([grid_w, grid_h], jnp.float32)
    net_factor = jnp.asarray([net_w, net_h], jnp.float32)
    anchors = jnp.asarray(cfg.anchors_array()[a * scale_idx: a * scale_idx + a])  # [A,2]

    box_xy = (cell_offsets(grid_h, grid_w) + pred_cxy) / grid_factor
    box_wh = jnp.exp(pred_twh) * anchors[None, None, None, :, :] / net_factor
    norm_coord = jnp.concatenate([box_xy, box_wh], axis=-1)

    return ScalePrediction(conf_logit, class_logit, coord, norm_coord, anchors)


def decode_all(raws: Sequence[jnp.ndarray], cfg: DISYoloConfig) -> List[ScalePrediction]:
    """Decode the three scales; ``raws[0]`` is the stride-8 map.

    ``net_hw`` is derived from the stride-32 map exactly like
    yolo3_net_pos.py:474-475 (net = 32 * grid of the coarsest head).
    """
    net_h = raws[2].shape[1] * 32
    net_w = raws[2].shape[2] * 32
    return [decode_scale(r, i, cfg, (net_h, net_w)) for i, r in enumerate(raws)]
