"""Train-step semantics: lock masking, BN stats, loss finiteness, BN fold."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import fold_batchnorm
from dis_yolo_tpu.train import train_step as ts


@pytest.fixture(scope="module")
def setup(small_cfg):
    cfg = small_cfg
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    return cfg, model, v


def make_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    s, t, g = cfg.image_size, cfg.max_box_per_image, cfg.base_grid
    c = cfg.num_class
    return dict(
        images=jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32)),
        true_masks=jnp.zeros((b, t, s, s), bool).at[:, 0, 10:40, 10:40].set(True),
        true_boxes=jnp.zeros((b, 1, 1, 1, t, 5)).at[:, 0, 0, 0, 0].set(
            jnp.asarray([0.26, 0.26, 0.31, 0.31, 1.0])),
        labels_s8=jnp.zeros((b, 4 * g, 4 * g, 3, 5 + c)).at[:, 8, 8, 0, :].set(
            jnp.asarray([0.26, 0.26, 0.31, 0.31, 1., 0., 1., 0.])),
        labels_s16=jnp.zeros((b, 2 * g, 2 * g, 3, 5 + c)),
        labels_s32=jnp.zeros((b, g, g, 3, 5 + c)),
        windows=jnp.tile(jnp.asarray([0., 0., 1., 1.]), (b, 1)),
    )


def test_locked_layers_fully_frozen(setup):
    """Regression: optax.masked leaked raw gradients into frozen layers."""
    cfg, model, v = setup
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    step = ts.make_jitted_train_step(model, tx)
    new_state, metrics = step(state, make_batch(cfg), jax.random.PRNGKey(1))

    assert np.isfinite(float(metrics["total_loss"]))
    for i in (1, 10, 33, 52):  # locked (stage-1 backbone)
        name = f"convolutional{i}"
        for leaf_old, leaf_new in zip(
                jax.tree.leaves(v["params"][name]),
                jax.tree.leaves(new_state.params[name])):
            np.testing.assert_array_equal(np.asarray(leaf_old), np.asarray(leaf_new))
        for leaf_old, leaf_new in zip(
                jax.tree.leaves(v["batch_stats"][name]),
                jax.tree.leaves(new_state.batch_stats[name])):
            np.testing.assert_array_equal(np.asarray(leaf_old), np.asarray(leaf_new))
    for i in (53, 58, 76, 82):  # unlocked heads / mask subnet
        name = f"convolutional{i}"
        delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(v["params"][name]),
            jax.tree.leaves(new_state.params[name])))
        assert delta > 0, f"{name} did not train"


def test_l2_mask_targets_unlocked_conv_only(setup):
    cfg, model, v = setup
    mask = ts.l2_params_mask(v["params"], cfg)
    assert not any(jax.tree.leaves(mask["convolutional10"]))      # locked
    assert all(jax.tree.leaves(mask["convolutional58"]["conv"]))  # unlocked conv
    assert not any(jax.tree.leaves(mask["convolutional58"]["bn"]))  # BN never


def test_loss_decreases_over_steps(setup):
    cfg, model, v = setup
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    step = ts.make_jitted_train_step(model, tx)
    batch = make_batch(cfg)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]


def test_reference_lr_schedule():
    sched = ts.reference_lr_schedule
    assert float(sched(jnp.asarray(1))) == pytest.approx(1e-3)
    assert float(sched(jnp.asarray(10000))) == pytest.approx(1e-3)
    assert float(sched(jnp.asarray(10001))) == pytest.approx(1e-4)
    assert float(sched(jnp.asarray(20001))) == pytest.approx(1e-5)
    assert float(sched(jnp.asarray(25001))) == pytest.approx(1e-6)


def test_bn_fold_preserves_outputs(setup):
    cfg, model, v = setup
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    # make stats non-trivial first: run one training forward
    _, new_stats = api.forward(model, v, img, train=True)
    v2 = {"params": v["params"], "batch_stats": new_stats}
    folded = fold_batchnorm(model, v2)
    out_a = api.forward(model, v2, img)
    out_b = api.forward(model, folded, img)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)  # bf16 compute
