"""Space-to-depth stem transform: exactness vs the plain conv1+conv2 stem.

The transform (models/s2d.py) claims mathematical identity with the
reference stem (yolo3_net_pos.py:158-162): conv1 3x3/s1 C->F1 followed by
conv2 3x3/s2 F1->F2 (TF 'SAME' = (0,1) padding), with leaky-ReLU between.
Verified here in f32 (exact up to dot-product reassociation) and at the
full deploy-model level.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables
from dis_yolo_tpu.models.s2d import (space_to_depth, s2d_stem_kernels,
                                     s2d_stem_variables)


def _leaky(x, alpha=0.1):
    return jnp.maximum(alpha * x, x)


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_stem_kernels_exact(rng):
    """f32 closed-form check on odd sizes of everything (C=3, F1=5 -> pads)."""
    h = 12
    x = jnp.asarray(rng.randn(2, h, h, 3).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    b1 = jnp.asarray(rng.randn(8).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    b2 = jnp.asarray(rng.randn(16).astype(np.float32))

    # reference stem: conv1 s1 + leaky, conv2 s2 + leaky
    y = _leaky(_conv(x, w1) + b1)
    z_ref = _leaky(_conv(y, w2, stride=2) + b2)

    w1p, b1p, w2p, b2p = s2d_stem_kernels(w1, b1, w2, b2)
    x2 = space_to_depth(x)
    y2 = _leaky(_conv(x2, jnp.asarray(w1p)) + jnp.asarray(b1p))
    z = _leaky(_conv(y2, jnp.asarray(w2p), padding=[(0, 1), (0, 1)])
               + jnp.asarray(b2p))

    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)

    # intermediate too: y2 is exactly y space-to-depth'd
    np.testing.assert_allclose(np.asarray(y2), np.asarray(space_to_depth(y)),
                               rtol=1e-5, atol=1e-5)


def test_s2d_model_matches_deploy(small_cfg, rng):
    cfg = small_cfg
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    _, stats = api.forward(model, v, img, train=True)   # non-trivial BN
    dv = deploy_variables({"params": v["params"], "batch_stats": stats})

    dcfg = cfg.replace(deploy=True)
    out_ref = api.forward(api.create_model(dcfg), dv, img)

    scfg = dcfg.replace(s2d_stem=True)
    sv = s2d_stem_variables(dv)
    smodel = api.create_model(scfg)
    # the s2d model inits with exactly the transformed tree shapes
    ref_tree = smodel.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    assert (jax.tree.structure(ref_tree["params"])
            == jax.tree.structure(sv["params"]))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_tree["params"]),
            jax.tree_util.tree_leaves_with_path(sv["params"])):
        assert a.shape == b.shape, (pa, a.shape, b.shape)

    out_s2d = api.forward(smodel, sv, img)
    for i, (a, b) in enumerate(zip(out_ref, out_s2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2,  # bf16 reassociation
                                   err_msg=f"output {i}")


def test_s2d_requires_deploy(small_cfg):
    import pytest
    cfg = small_cfg.replace(s2d_stem=True)   # deploy=False
    with pytest.raises(ValueError, match="s2d_stem requires"):
        api.init_variables(cfg, jax.random.PRNGKey(0))
