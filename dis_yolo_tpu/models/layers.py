"""Fused conv/BN/leaky-ReLU building blocks (Flax linen).

Parity targets in the reference:
  * ``conv``        — yolo3_net_pos.py:109-130 (Xavier init, optional bias,
                      optional leaky-ReLU, L2 1e-4 on weights+biases)
  * ``batch_norm``  — yolo3_net_pos.py:71-107 (decay .997, eps 1e-5; locked
                      layers always normalize with moving statistics)
  * ``conv_bn``     — yolo3_net_pos.py:132-146
  * ``res_conv_bn`` — yolo3_net_pos.py:148-151 (residual add)

The reference's ``lock=True`` transfer-learning freeze (non-trainable vars +
pure-inference BN) maps here to (a) ``use_running_average=True`` regardless
of train mode and (b) a gradient mask in the optimizer
(``dis_yolo_tpu/train/solver.py``).  XLA fuses conv+BN+LeakyReLU into a
single MXU kernel; at inference we additionally fold BN into the conv
weights (``dis_yolo_tpu/models/fold.py``) so the deploy path is conv+bias
only.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.997
BN_EPS = 1e-5


def leaky_relu(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    return jnp.maximum(alpha * x, x)


class ConvBN(nn.Module):
    """3x3/1x1 conv (no bias) + BatchNorm + optional leaky-ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    alpha: float = 0.1
    lock: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # mesh axis for cross-replica (sync) BN statistics, None = local batch
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME", use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        # BN statistics/affine in float32 for stability; locked layers use
        # moving statistics even in training (reference lock branch :77-81).
        x = nn.BatchNorm(
            use_running_average=(not train) or self.lock,
            momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.bn_axis,
            dtype=jnp.float32, param_dtype=jnp.float32, name="bn",
        )(x.astype(jnp.float32))
        x = x.astype(self.dtype)
        if self.act:
            x = leaky_relu(x, self.alpha)
        return x


class ConvBias(nn.Module):
    """1x1 head conv with bias, no BN, no activation (layers 59/67/75/82)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME", use_bias=True,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class DeployConv(nn.Module):
    """Inference-only fused block: conv + folded-BN bias + leaky, pure
    compute-dtype (no BatchNorm module, no f32 casts).  Parameters come from
    ``models.fold.deploy_variables``."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    alpha: float = 0.1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME", use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        if self.act:
            x = leaky_relu(x, self.alpha)
        return x


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (tf.image.resize_nearest_neighbor parity).

    Implemented as reshape+broadcast (pure layout ops, cheaper than a
    gather-based resize and exactly equivalent for integer factors).
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class _SplitConcatConv(nn.Module):
    """1x1 conv over a virtual ``concat([skip, up2(small)])`` without ever
    materializing it: the kernel is split row-wise and the ``small``
    branch's conv runs BEFORE the upsample (1x1 convs commute with
    nearest-neighbor duplication).  Parameter path/shape (``kernel``
    [1,1,cs+cu,features]) is identical to the ``nn.Conv`` the concat form
    would create, so checkpoints are interchangeable."""

    features: int
    cin: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip: jnp.ndarray, small: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (1, 1, self.cin, self.features), self.param_dtype)
        k = kernel.astype(self.dtype)
        cs = skip.shape[-1]
        dn = ("NHWC", "HWIO", "NHWC")
        out_s = jax.lax.conv_general_dilated(
            skip.astype(self.dtype), k[:, :, :cs], (1, 1), "SAME",
            dimension_numbers=dn)
        out_u = jax.lax.conv_general_dilated(
            small.astype(self.dtype), k[:, :, cs:], (1, 1), "SAME",
            dimension_numbers=dn)
        return out_s + upsample2x_nearest(out_u)


class CommutedConcatConvBN(nn.Module):
    """ConvBN over ``concat([skip, up2(small)])`` with the 1x1 commuted
    before the upsample — measured 7.2x faster than the materialized
    concat form at 288^2 on v5e (scripts/probe_decoder.py; the concat is
    pure memory traffic and the up-branch conv runs at quarter
    resolution).  Bit-compatible parameters with the ConvBN it replaces
    (conv/kernel + bn/*); mathematically exact commute, so outputs agree
    to accumulation-order ULPs (tests/test_model_variants.py)."""

    features: int
    cin: int
    act: bool = True
    alpha: float = 0.1
    lock: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, skip: jnp.ndarray, small: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x = _SplitConcatConv(self.features, self.cin, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="conv")(skip, small)
        x = nn.BatchNorm(
            use_running_average=(not train) or self.lock,
            momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.bn_axis,
            dtype=jnp.float32, param_dtype=jnp.float32, name="bn",
        )(x.astype(jnp.float32))
        x = x.astype(self.dtype)
        if self.act:
            x = leaky_relu(x, self.alpha)
        return x
