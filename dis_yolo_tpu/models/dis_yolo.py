"""DIS-YOLO network: Darknet-53 backbone, 3 YOLOv3 heads, mask decoder.

Architecture parity with the reference ``build_network``
(yolo3_net_pos.py:153-463): 52 backbone conv_bn layers with skip taps at
1x .. 1/16 resolution, three detection towers at strides 32/16/8 emitting
``(5 + C) * 3`` channels, and an FPN-style mask decoder continuing from the
stride-8 tower down to stride-2 position-sensitive score maps (k^2 = 9
channels).  Layer modules are named ``convolutional1..82`` so pretrained TF1
checkpoints map 1:1 (see train_yolo3_mask.py:87-101 scope names).

The module is a pure function of (params, batch_stats); all per-image
postprocessing (decode / NMS / mask assembly) lives in ``dis_yolo_tpu.ops``
and is composed by ``dis_yolo_tpu.models.api``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models.layers import ConvBias, ConvBN, upsample2x_nearest


class DISYolo(nn.Module):
    """Returns (raw_s8, raw_s16, raw_s32, scoremaps).

    raw_sN: [B, H/N, W/N, 3, 5+C] raw head outputs (stride N)
    scoremaps: [B, H/2, W/2, k*k] position-sensitive score maps

    ``stop_stage`` is a PROFILING probe (scripts/forward_budget.py): the
    forward returns early at a named cut point ("stem", "c128", "c256",
    "c512", "backbone", "heads") so cumulative chain-scan timings of the
    truncated programs itemize where the forward milliseconds go.  None
    (the default) is the full network; training never sets it.
    """

    cfg: DISYoloConfig
    stop_stage: "str | None" = None

    def _up_concat_cbn(self, idx: int, features: int, skip, small, train):
        """Decoder fusion node: ConvBN1x1(concat([skip, up2(small)])).

        With ``cfg.decoder_commute`` the 1x1 runs BEFORE the upsample via
        a row-split kernel (layers.CommutedConcatConvBN) — exact algebra,
        same parameter tree, measured 7.2x faster than materializing the
        concat at 288^2 (scripts/probe_decoder.py).  Default off keeps
        the reference's literal graph order (yolo3_net_pos.py:383-401
        resize -> concat -> conv).
        """
        cfg = self.cfg
        if cfg.decoder_commute and not (cfg.deploy or cfg.quant):
            from dis_yolo_tpu.models.layers import CommutedConcatConvBN
            cin = skip.shape[-1] + small.shape[-1]
            return CommutedConcatConvBN(
                features=features, cin=cin, act=True, alpha=cfg.alpha,
                lock=idx in cfg.locked_layers, bn_axis=cfg.bn_axis,
                dtype=jnp.dtype(cfg.compute_dtype),
                param_dtype=jnp.dtype(cfg.param_dtype),
                name=f"convolutional{idx}")(skip, small, train)
        m = jnp.concatenate([skip, upsample2x_nearest(small)], axis=-1)
        return self._cbn(idx, features, 1)(m, train)

    def _cbn(self, idx: int, features: int, kernel: int, stride: int = 1):
        cfg = self.cfg
        if cfg.quant and idx in cfg.quant_layers:
            from dis_yolo_tpu.models.quant import QuantConv
            return QuantConv(
                features=features, kernel=kernel, stride=stride, act=True,
                alpha=cfg.alpha, calibrate=cfg.quant_calibrate,
                calib_pct=cfg.quant_calib_pct,
                dtype=jnp.dtype(cfg.compute_dtype),
                param_dtype=jnp.dtype(cfg.param_dtype),
                name=f"convolutional{idx}",
            )
        if cfg.deploy or cfg.quant:
            # quant graphs keep their non-quantized layers (the stem by
            # default) in the fused float deploy form
            from dis_yolo_tpu.models.layers import DeployConv
            return DeployConv(
                features=features, kernel=kernel, stride=stride, act=True,
                alpha=cfg.alpha, dtype=jnp.dtype(cfg.compute_dtype),
                param_dtype=jnp.dtype(cfg.param_dtype),
                name=f"convolutional{idx}",
            )
        # cfg.remat: store only each layer's input for backprop and
        # recompute conv/BN/act inside the backward pass (argnums: 0=self,
        # 1=x, 2=train — train is a Python bool, so static).
        cls = (nn.remat(ConvBN, static_argnums=(2,)) if cfg.remat
               else ConvBN)
        return cls(
            features=features, kernel=kernel, stride=stride, act=True,
            alpha=cfg.alpha, lock=idx in cfg.locked_layers,
            bn_axis=cfg.bn_axis,
            dtype=jnp.dtype(cfg.compute_dtype), param_dtype=jnp.dtype(cfg.param_dtype),
            name=f"convolutional{idx}",
        )

    def _cbias(self, idx: int, features: int) -> ConvBias:
        cfg = self.cfg
        return ConvBias(
            features=features, kernel=1, stride=1,
            dtype=jnp.dtype(cfg.compute_dtype), param_dtype=jnp.dtype(cfg.param_dtype),
            name=f"convolutional{idx}",
        )

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        a, c = cfg.anchors_per_scale, cfg.num_class
        x = images.astype(jnp.dtype(cfg.compute_dtype))

        # ---- Darknet-53 backbone (yolo3_net_pos.py:158-254) ----
        if cfg.s2d_stem:
            # exact space-to-depth rewrite of conv1+conv2 (models/s2d.py):
            # conv1' sees (a,b,ch)-packed 12-channel input and emits conv1's
            # output repacked as 128 channels at half resolution; conv2'
            # (2x2, stride 1 — 'SAME' pads (0,1) exactly like the original
            # stride-2 conv) lands on conv2's natural 288^2x64 output.
            if not cfg.deploy or cfg.mask_stride == 1:
                raise ValueError("s2d_stem requires deploy=True and "
                                 "mask_stride != 1 (conv1 skip unavailable)")
            from dis_yolo_tpu.models.s2d import space_to_depth
            x = space_to_depth(x)
            x = self._cbn(1, 128, 3)(x, train)
            skip1 = None                              # full-res tap not built
            x = self._cbn(2, 64, 2)(x, train)
        else:
            x = self._cbn(1, 32, 3)(x, train)
            skip1 = x                                 # 1/1, 32ch (s1 decoder)
            x = self._cbn(2, 64, 3, 2)(x, train)
        if self.stop_stage == "stem":
            return (x,)
        x = x + self._cbn(4, 64, 3)(self._cbn(3, 32, 1)(x, train), train)
        skip2 = x                                     # 1/2, 64ch
        x = self._cbn(5, 128, 3, 2)(x, train)
        x = x + self._cbn(7, 128, 3)(self._cbn(6, 64, 1)(x, train), train)
        x = x + self._cbn(9, 128, 3)(self._cbn(8, 64, 1)(x, train), train)
        skip3 = x                                     # 1/4, 128ch
        if self.stop_stage == "c128":
            return (x,)
        x = self._cbn(10, 256, 3, 2)(x, train)
        for i in range(8):
            x = x + self._cbn(2 * i + 12, 256, 3)(
                self._cbn(2 * i + 11, 128, 1)(x, train), train)
        skip4 = x                                     # 1/8, 256ch
        if self.stop_stage == "c256":
            return (x,)
        x = self._cbn(27, 512, 3, 2)(x, train)
        for i in range(8):
            x = x + self._cbn(2 * i + 29, 512, 3)(
                self._cbn(2 * i + 28, 256, 1)(x, train), train)
        skip5 = x                                     # 1/16, 512ch
        if self.stop_stage == "c512":
            return (x,)
        x = self._cbn(44, 1024, 3, 2)(x, train)
        for i in range(4):
            x = x + self._cbn(2 * i + 46, 1024, 3)(
                self._cbn(2 * i + 45, 512, 1)(x, train), train)

        if self.stop_stage == "backbone":
            return (x,)
        # ---- head 1: stride 32, large objects (:257-281) ----
        x = self._cbn(53, 512, 1)(x, train)
        x = self._cbn(54, 1024, 3)(x, train)
        x = self._cbn(55, 512, 1)(x, train)
        x = self._cbn(56, 1024, 3)(x, train)
        x = self._cbn(57, 512, 1)(x, train)
        y1 = self._cbn(58, 1024, 3)(x, train)
        y1 = self._cbias(59, cfg.output_depth)(y1)
        b, h, w, _ = y1.shape
        raw_s32 = y1.reshape(b, h, w, a, 5 + c)

        # ---- head 2: stride 16 (:284-316) ----
        x = self._cbn(60, 256, 1)(x, train)
        x = jnp.concatenate([skip5, upsample2x_nearest(x)], axis=-1)
        x = self._cbn(61, 256, 1)(x, train)
        x = self._cbn(62, 512, 3)(x, train)
        x = self._cbn(63, 256, 1)(x, train)
        x = self._cbn(64, 512, 3)(x, train)
        x = self._cbn(65, 256, 1)(x, train)
        y2 = self._cbn(66, 512, 3)(x, train)
        y2 = self._cbias(67, cfg.output_depth)(y2)
        b, h, w, _ = y2.shape
        raw_s16 = y2.reshape(b, h, w, a, 5 + c)

        # ---- head 3: stride 8 (:319-351) ----
        x = self._cbn(68, 128, 1)(x, train)
        x = jnp.concatenate([skip4, upsample2x_nearest(x)], axis=-1)
        x = self._cbn(69, 128, 1)(x, train)
        x = self._cbn(70, 256, 3)(x, train)
        x = self._cbn(71, 128, 1)(x, train)
        x = self._cbn(72, 256, 3)(x, train)
        x = self._cbn(73, 128, 1)(x, train)
        y3 = self._cbn(74, 256, 3)(x, train)
        y3 = self._cbias(75, cfg.output_depth)(y3)
        b, h, w, _ = y3.shape
        raw_s8 = y3.reshape(b, h, w, a, 5 + c)

        if self.stop_stage == "heads":
            return (x,)
        # ---- mask decoder: stride 8 -> cfg.mask_stride score maps ----
        # stride 4: reference's commented m=1/4 variant (:362-378)
        # stride 2: the published decoder (:380-412)
        # stride 1: the commented m=1 85-layer variant (:415-461)
        m = self._cbn(76, 64, 1)(x, train)
        m = self._up_concat_cbn(77, 64, skip3, m, train)
        m = self._cbn(78, 128, 3)(m, train)
        if cfg.mask_stride == 4:
            scoremaps = self._cbias(79, cfg.num_scoremaps)(m)
        else:
            m = self._cbn(79, 32, 1)(m, train)
            m = self._up_concat_cbn(80, 32, skip2, m, train)
            m = self._cbn(81, 64, 3)(m, train)
            if cfg.mask_stride == 2:
                scoremaps = self._cbias(82, cfg.num_scoremaps)(m)
            elif cfg.mask_stride == 1:
                m = self._cbn(82, 16, 1)(m, train)
                m = self._up_concat_cbn(83, 16, skip1, m, train)
                m = self._cbn(84, 32, 3)(m, train)
                scoremaps = self._cbias(85, cfg.num_scoremaps)(m)
            else:
                raise ValueError(f"mask_stride must be 1, 2 or 4, "
                                 f"got {cfg.mask_stride}")
        return (raw_s8.astype(jnp.float32), raw_s16.astype(jnp.float32),
                raw_s32.astype(jnp.float32), scoremaps.astype(jnp.float32))
