"""Deploy-mode (BN-free fused conv) parity with the training graph."""

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables, fold_batchnorm


def test_deploy_matches_train_graph(small_cfg, rng):
    cfg = small_cfg
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    # make BN statistics non-trivial first
    _, stats = api.forward(model, v, img, train=True)
    v = {"params": v["params"], "batch_stats": stats}

    dmodel = api.create_model(cfg.replace(deploy=True))
    dv = deploy_variables(v)
    out_a = api.forward(model, v, img)
    out_b = api.forward(dmodel, dv, img)
    for i, (a, b) in enumerate(zip(out_a, out_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2,  # bf16 fusion drift
                                   err_msg=f"output {i}")


def test_deploy_param_tree_structure(small_cfg):
    cfg = small_cfg
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    dv = deploy_variables(v)
    assert "batch_stats" not in dv
    for name, layer in dv["params"].items():
        assert set(layer) == {"conv"}
        assert set(layer["conv"]) == {"kernel", "bias"}, name
    # the deploy model inits with exactly this tree shape
    dmodel = api.create_model(cfg.replace(deploy=True))
    ref = dmodel.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    assert jax.tree.structure(ref["params"]) == jax.tree.structure(dv["params"])


def test_fold_then_deploy_consistent(small_cfg, rng):
    """fold_batchnorm followed by deploy conversion equals direct deploy."""
    cfg = small_cfg
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(1))
    direct = deploy_variables(v)
    folded = fold_batchnorm(model, v)
    via_fold = deploy_variables(folded)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(via_fold)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
