"""Post-training int8 quantization of the deploy graph (serving fast path).

The v5e MXU runs s8 x s8 -> s32 convolutions at ~2x the bf16 rate
(measured 285-327 TOPS vs 146-196 TFLOP/s, scripts/probe_int8.py), and the
big-channel convs are ~70% of the forward wall time — so an int8 deploy
graph roughly halves the dominant cost of serving.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8,  s_w[c] = max|w[..,c]| / 127
  * activations: per-tensor symmetric int8,      s_x   = calibrated
    absmax / 127, calibrated by running representative images through the
    deploy graph in calibration mode (each QuantConv sows its input absmax)
  * conv executes as int8 with int32 accumulation (MXU double-rate path);
    dequant folds into the epilogue: y = conv_s32 * (s_x * s_w) + bias

The quantized model reuses the DISYolo topology via ``cfg.quant=True``
(QuantConv in place of DeployConv); ``quantize_deploy`` converts
deploy-format variables + calibration stats into the quantized tree.
Bias convs (59/67/75/82/85 — raw head outputs) stay f32/bf16: they are
cheap 1x1s and their outputs feed sigmoid/exp decodes where quantization
noise matters most.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class QuantConv(nn.Module):
    """int8 conv + f32 dequant epilogue + bias + optional leaky-ReLU.

    In calibration mode (``calibrate=True`` at apply time with
    ``mutable=['intermediates']``) it runs the float conv and sows the
    input absmax instead of quantizing.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    alpha: float = 0.1
    calibrate: bool = False
    calib_pct: float = 99.9
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel
        if self.calibrate:
            # float path (parameter tree identical to DeployConv, so the
            # deploy variables apply directly), recording the input scale:
            # both the absmax and a high-percentile absmax (outlier-robust
            # alternative — one hot pixel in a calibration image otherwise
            # silently degrades every downstream layer).  The percentile is
            # computed as the k-th largest of a deterministic <=1M-element
            # stride subsample (top_k, not a full sort — a quantile sort
            # per layer made the calibration graph minutes-slow to
            # compile; a 1M sample puts ~1k points above the 99.9th
            # percentile, plenty for a scale estimate).
            ax = jnp.abs(x.astype(jnp.float32)).ravel()
            self.sow("intermediates", "in_absmax", jnp.max(ax))
            sample = ax[::max(1, ax.size // (1 << 20))]
            kth = max(1, round(sample.size * (1.0 - self.calib_pct / 100.0)))
            self.sow("intermediates", "in_pct",
                     jax.lax.top_k(sample, kth)[0][-1])
            y = nn.Conv(
                self.features, (k, k), strides=(self.stride, self.stride),
                padding="SAME", use_bias=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv",
            )(x)
        else:
            w_q = self.param("w_q", nn.initializers.zeros,
                             (k, k, jnp.shape(x)[-1], self.features), jnp.int8)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            inv_sx = self.param("inv_sx", nn.initializers.ones, (), jnp.float32)
            s_out = self.param("s_out", nn.initializers.ones,
                               (self.features,), jnp.float32)
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_sx),
                           -127.0, 127.0).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x_q, w_q, (self.stride, self.stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * s_out + bias
        y = y.astype(self.dtype)
        if self.act:
            y = jnp.maximum(self.alpha * y, y)
        return y


def calibrate_deploy(model, deploy_vars: Dict[str, Any],
                     images: jnp.ndarray,
                     use_pct: bool = False) -> Dict[str, float]:
    """Run calibration images through the quant model's float path.

    ``model`` must be the ``cfg.replace(quant=True, quant_calibrate=True)``
    DISYolo; parameters come from the float deploy tree (same kernel/bias
    names).  Returns {layer_name: activation scale numerator} — the input
    absmax, or with ``use_pct`` the ``calib_pct``-percentile absmax the
    model was built with (``cfg.quant_calib_pct``), which is robust to
    single-pixel outliers in the calibration images.
    """
    _, inter = model.apply(deploy_vars, images, train=False,
                           mutable=["intermediates"])
    key = "in_pct" if use_pct else "in_absmax"
    out = {}
    for name, rec in inter["intermediates"].items():
        out[name] = float(rec[key][0])
    return out


def quantize_deploy(deploy_vars: Dict[str, Any],
                    act_absmax: Dict[str, float]) -> Dict[str, Any]:
    """Float deploy variables + calibration stats -> int8 quant variables.

    Layers present in ``act_absmax`` become QuantConv trees
    (w_q/bias/inv_sx/s_out); the rest (bias head convs) pass through.
    """
    params: Dict[str, Any] = {}
    for name, layer in deploy_vars["params"].items():
        if name not in act_absmax:
            params[name] = jax.tree.map(lambda x: x, layer)
            continue
        w = np.asarray(layer["conv"]["kernel"], np.float32)
        b = np.asarray(layer["conv"]["bias"], np.float32)
        s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0),
                         1e-12) / 127.0                      # [Cout]
        s_x = max(act_absmax[name], 1e-12) / 127.0
        w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        params[name] = {
            "w_q": jnp.asarray(w_q),
            "bias": jnp.asarray(b),
            "inv_sx": jnp.asarray(1.0 / s_x, jnp.float32),
            "s_out": jnp.asarray(s_x * s_w, jnp.float32),
        }
    return {"params": params}
