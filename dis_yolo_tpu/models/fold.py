"""Inference-time BatchNorm folding.

Folds each ConvBN's BN affine+statistics into the conv kernel so the deploy
path is mathematically conv+bias (the reference's commented BN "fast path"
for timing, yolo3_net_pos.py:105-106, made exact).  The variable structure
is preserved — BN is turned into a pure `x + bias'` (scale=1, mean=0,
var=1-eps) which XLA folds into the conv epilogue — so folded params remain
drop-in for the same model definition.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dis_yolo_tpu.models.layers import BN_EPS


def fold_batchnorm(model, variables: Dict[str, Any]) -> Dict[str, Any]:
    params = jax.tree.map(lambda x: x, variables["params"])       # copy
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])

    for name, layer in params.items():
        if name not in stats or "bn" not in layer:
            continue
        bn = layer["bn"]
        st = stats[name]["bn"]
        inv = bn["scale"] / jnp.sqrt(st["var"] + BN_EPS)          # [C]
        layer["conv"]["kernel"] = layer["conv"]["kernel"] * inv   # HWIO * [C]
        bn["bias"] = bn["bias"] - st["mean"] * inv
        bn["scale"] = jnp.ones_like(bn["scale"])
        st["mean"] = jnp.zeros_like(st["mean"])
        st["var"] = jnp.ones_like(st["var"]) - BN_EPS

    return {"params": params, "batch_stats": stats}


def deploy_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Trained {params, batch_stats} -> deploy-mode params.

    Each ConvBN layer becomes a single conv with
      kernel' = kernel * gamma / sqrt(var + eps)
      bias'   = beta - mean * gamma / sqrt(var + eps)
    consumed by ``DISYolo(cfg.replace(deploy=True))``.  Bias-conv layers
    (59/67/75/79/82/85) pass through unchanged.
    """
    out: Dict[str, Any] = {}
    params = variables["params"]
    stats = variables["batch_stats"]
    for name, layer in params.items():
        if "bn" in layer:
            bn = layer["bn"]
            st = stats[name]["bn"]
            inv = bn["scale"] / jnp.sqrt(st["var"] + BN_EPS)
            out[name] = {"conv": {
                "kernel": layer["conv"]["kernel"] * inv,
                "bias": bn["bias"] - st["mean"] * inv,
            }}
        else:
            out[name] = jax.tree.map(lambda x: x, layer)
    return {"params": out}
