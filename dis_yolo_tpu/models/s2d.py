"""Space-to-depth stem: exact TPU-friendly rewrite of conv1 + conv2.

The Darknet-53 stem (reference yolo3_net_pos.py:158-162: convolutional1
3x3/s1 3->32 at 576^2, convolutional2 3x3/s2 32->64) is the forward pass's
bottleneck on TPU: with only 3/32 channels the 128-wide vector lanes are
mostly padding, and XLA inserts layout copies around the stem (measured
17.5 TFLOP/s vs 196 TFLOP/s for the >=128-channel layers —
scripts/profile_forward.py).  The classic fix (MLPerf ResNet) is to
space-to-depth the input into 2x2 blocks and *transform the weights* so the
computation is mathematically identical but every conv runs with >=12 input
/ >=64 output channels at half resolution:

  x [B,576,576,3]  --s2d-->  x2 [B,288,288,12]        (a,b,ch) packing
  conv1' : 3x3/s1 12->128, SAME      == conv1 with its 576^2x32 output
                                        repacked as 288^2x128 (a,b,o)
  conv2' : 2x2/s1 128->64, pad (0,1) == conv2 (which is stride 2), already
                                        at its natural 288^2x64 shape

Derivation: output row r = 2i+a reads input rows 2i+a+u; writing
a+u = 2*dI + a' places original tap (u, ch) at block-kernel tap
(dI, (a', ch)).  For conv1 (u in -1..1) dI spans -1..1 -> 3x3 block kernel;
for conv2 (TF 'SAME' stride-2 pads (0,1), so u in 0..2) dI spans 0..1 ->
2x2 block kernel with explicit (0,1) padding.  Both transforms are sparse
embeddings of the original weights (zeros elsewhere), so results are exact
up to bf16 summation order.

Inference-only (deploy graph): the transform consumes deploy-format
(kernel+bias) parameters.  Not available with mask_stride=1, which needs
conv1's full-resolution output as a skip (models/dis_yolo.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with (a, b, ch) channel packing."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)             # [B, H/2, W/2, a, b, C]
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _pack(a: int, b: int, n: int) -> slice:
    """Channel slice of sub-position (a, b) in (a, b, ch)-packed depth."""
    i = (a * 2 + b) * n
    return slice(i, i + n)


def s2d_stem_kernels(w1: np.ndarray, b1: np.ndarray,
                     w2: np.ndarray, b2: np.ndarray):
    """(conv1 [3,3,C,F1], conv2 [3,3,F1,F2]) -> s2d-domain kernels.

    Returns (w1p [3,3,4C,4F1], b1p [4F1], w2p [2,2,4F1,F2], b2p [F2]).
    """
    w1, w2 = np.asarray(w1), np.asarray(w2)
    c, f1 = w1.shape[2], w1.shape[3]
    f2 = w2.shape[3]

    w1p = np.zeros((3, 3, 4 * c, 4 * f1), w1.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for u in (-1, 0, 1):
                di, ap = divmod(a + u, 2)
                for v in (-1, 0, 1):
                    dj, bp = divmod(b + v, 2)
                    w1p[di + 1, dj + 1, _pack(ap, bp, c), _pack(a, b, f1)] \
                        = w1[u + 1, v + 1]
    b1p = np.concatenate([np.asarray(b1)] * 4)

    w2p = np.zeros((2, 2, 4 * f1, f2), w2.dtype)
    for u in range(3):
        di, ap = divmod(u, 2)
        for v in range(3):
            dj, bp = divmod(v, 2)
            w2p[di, dj, _pack(ap, bp, f1), :] = w2[u, v]
    return w1p, b1p, w2p, np.asarray(b2)


def s2d_stem_variables(deploy_vars: Dict[str, Any]) -> Dict[str, Any]:
    """Deploy-format variables -> variables for ``cfg.s2d_stem=True``.

    Replaces convolutional1/convolutional2 kernels+biases with their
    space-to-depth-domain transforms; all other layers pass through.
    """
    params = dict(deploy_vars["params"])
    c1, c2 = params["convolutional1"]["conv"], params["convolutional2"]["conv"]
    w1p, b1p, w2p, b2p = s2d_stem_kernels(
        c1["kernel"], c1["bias"], c2["kernel"], c2["bias"])
    params["convolutional1"] = {"conv": {"kernel": jnp.asarray(w1p),
                                         "bias": jnp.asarray(b1p)}}
    params["convolutional2"] = {"conv": {"kernel": jnp.asarray(w2p),
                                         "bias": jnp.asarray(b2p)}}
    return {"params": params}
