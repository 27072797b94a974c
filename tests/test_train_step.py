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


def test_remat_grads_match_plain(small_cfg):
    """cfg.remat recomputes ConvBN internals in backward — same math, so
    model gradients must agree with the plain build.

    Sized at 64px, NOT the suite's usual 96: at 96 (odd stride-32 grid)
    the random-init gradient through ~80 stacked BN layers is chaotically
    ill-conditioned — a 1e-6 input perturbation swings early-layer grads
    by >200% relative, and jit-vs-eager differ just as much for the
    PLAIN model (fp reassociation only; eager plain == eager remat is
    bit-exact, which is the semantic proof).  At 64 the jit builds agree
    tightly, making the comparison meaningful."""
    results = {}
    for remat in (False, True):
        c = small_cfg.replace(compute_dtype="float32", image_size=64,
                              test_size=64, remat=remat)
        model = api.create_model(c)
        v = api.init_variables(c, jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(2, 64, 64, 3).astype(np.float32))

        def loss(p):
            outs, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        results[remat] = jax.jit(jax.value_and_grad(loss))(v["params"])

    (loss_a, g_a), (loss_b, g_b) = results[False], results[True]
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3 * scale)


def test_remat_train_step_runs(small_cfg):
    """Full train step (bf16, NMS proposals, ROI mask loss, Adam) under
    cfg.remat: compiles, loss finite, unlocked params move."""
    cfg = small_cfg.replace(remat=True)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    step = ts.make_jitted_train_step(model, tx)
    new_state, metrics = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(v["params"]["convolutional82"]),
        jax.tree.leaves(new_state.params["convolutional82"])))
    assert delta > 0


def test_grad_accum_matches_sequential_composition(small_cfg):
    """The accumulation contract: grad_accum=n over batch B must equal the
    mean of the n per-microbatch gradients computed one after another with
    BN running stats threaded through (that IS the semantics — PARITY.md
    deviation 6; it deliberately differs from one large batch because BN
    *moments* see a microbatch).  Comparing against the sequential
    composition (same microbatch shapes, same math) keeps the check out of
    the chaotic big-batch-vs-small-batch BN territory documented at
    test_remat_grads_match_plain; 64px/f32 for conditioning."""
    cfg = small_cfg.replace(compute_dtype="float32", image_size=64,
                            test_size=64, grad_accum=2)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, b=4)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)

    accum_fn = jax.jit(ts.grads_and_aux, static_argnums=(4,))
    g_acc, s_acc, m_acc = accum_fn(v["params"], v["batch_stats"], batch,
                                   keys, model)

    ref_model = api.create_model(cfg.replace(grad_accum=1))
    stats = v["batch_stats"]
    gs, ms = [], []
    for i in (0, 2):
        micro = jax.tree.map(lambda x: x[i:i + 2], batch)
        g, stats, m = accum_fn(v["params"], stats, micro, keys[i:i + 2],
                               ref_model)
        gs.append(g)
        ms.append(m)

    np.testing.assert_allclose(
        float(m_acc["total_loss"]),
        (float(ms[0]["total_loss"]) + float(ms[1]["total_loss"])) / 2,
        rtol=1e-5)
    want = jax.tree.map(lambda a, b: (a + b) / 2, gs[0], gs[1])
    for a, b in zip(jax.tree.leaves(g_acc), jax.tree.leaves(want)):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3 * scale)
    # running stats thread sequentially: accum result == composition result
    for a, b in zip(jax.tree.leaves(s_acc), jax.tree.leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accum_train_step_runs(small_cfg):
    """Full jitted step with grad_accum=2: compiles, finite, locked layers
    stay frozen, unlocked move; step counter advances once per step."""
    cfg = small_cfg.replace(grad_accum=2)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    step = ts.make_jitted_train_step(model, tx)
    new_state, metrics = step(state, make_batch(cfg, b=4),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1
    for a, b in zip(jax.tree.leaves(v["params"]["convolutional10"]),
                    jax.tree.leaves(new_state.params["convolutional10"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(v["params"]["convolutional82"]),
        jax.tree.leaves(new_state.params["convolutional82"])))
    assert delta > 0


def test_grad_accum_rejects_indivisible_batch(small_cfg):
    cfg = small_cfg.replace(grad_accum=3)
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    with pytest.raises(ValueError, match="divisible"):
        ts.grads_and_aux(v["params"], v["batch_stats"],
                         make_batch(cfg, b=4), keys, model)


def test_donated_state_loop(setup):
    """donate=True invalidates the input state and supports the
    state = step(state, ...) training loop shape."""
    cfg, model, v = setup
    tx = ts.make_optimizer(v["params"], cfg)
    # fresh state arrays (the module-scoped `v` must stay alive for other
    # tests, so donate copies, not the fixture's buffers)
    params = jax.tree.map(jnp.array, v["params"])
    stats = jax.tree.map(jnp.array, v["batch_stats"])
    state = ts.TrainState(params, stats, tx.init(params), jnp.asarray(0))
    first_param = jax.tree.leaves(state.params)[0]
    step = ts.make_jitted_train_step(model, tx, donate=True)
    batch = make_batch(cfg)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    assert first_param.is_deleted()
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 2


def test_multi_step_matches_single(setup):
    """The K-steps-per-dispatch scan block reproduces the per-step loop
    seed-for-seed: same per-step key sequence (carried RNG equals the
    Solver's host-side split protocol, bit-exact), same step math (step-1
    loss matches to float precision) and the same 4-step trajectory.

    Numerics of the comparison (measured on the 8-virtual-CPU host): a
    K=1 scan block reproduces the single step's loss AND BN stats
    BIT-EXACTLY, but the scan body's bf16 backward fuses differently, so
    gradients (Adam moments) carry bf16 noise and params move apart by
    ~2x LR per step.  Any nonzero param perturbation then flips bf16
    rounding boundaries in later forwards, fuzzing subsequent losses by
    ~0.2% regardless of how small the perturbation is.  Hence: LR 1e-8
    keeps the param trajectories tight (asserted to ~1e-6), while the
    metric trajectory is asserted only to the inherent bf16 noise
    floor.  The mechanism under test (Adam + lock masking + BN-stat
    carry + per-step key protocol) is fully exercised."""
    cfg, model, v = setup
    tx = ts.make_optimizer(v["params"], cfg.replace(lr_values=(1e-8,) * 4))

    def fresh():
        params = jax.tree.map(jnp.array, v["params"])
        stats = jax.tree.map(jnp.array, v["batch_stats"])
        return ts.TrainState(params, stats, tx.init(params), jnp.asarray(0))

    batches = [make_batch(cfg, seed=i) for i in range(4)]

    # per-step path with the Solver's host RNG protocol
    step = ts.make_jitted_train_step(model, tx)
    rng = jax.random.PRNGKey(7)
    st, singles = fresh(), []
    for b in batches:
        rng, key = jax.random.split(rng)
        st, m = step(st, b, key)
        singles.append(float(m["total_loss"]))

    # one K=4 block
    multi = ts.make_jitted_multi_step(model, tx, donate=False)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    st2, rng2, metrics = multi(fresh(), stacked, jax.random.PRNGKey(7))

    assert int(st2.step) == 4
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(rng))
    losses = np.asarray(metrics["total_loss"])
    np.testing.assert_allclose(losses[0], singles[0], rtol=2e-5)
    np.testing.assert_allclose(losses, np.asarray(singles), rtol=1e-2)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)
    for a, b in zip(jax.tree.leaves(st.batch_stats),
                    jax.tree.leaves(st2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_multi_step_donates_state(setup):
    """donate=True (the Solver default) invalidates the input state and
    supports consecutive blocks of different length (save-window tail)."""
    cfg, model, v = setup
    tx = ts.make_optimizer(v["params"], cfg)
    params = jax.tree.map(jnp.array, v["params"])
    stats = jax.tree.map(jnp.array, v["batch_stats"])
    state = ts.TrainState(params, stats, tx.init(params), jnp.asarray(0))
    first_param = jax.tree.leaves(state.params)[0]
    multi = ts.make_jitted_multi_step(model, tx, donate=True)
    rng = jax.random.PRNGKey(3)
    b2 = {k: jnp.stack([v_, v_]) for k, v_ in make_batch(cfg).items()}
    state, rng, m = multi(state, b2, rng)
    assert first_param.is_deleted()
    b1 = {k: v_[None] for k, v_ in make_batch(cfg, seed=1).items()}
    state, rng, m = multi(state, b1, rng)   # shorter tail block recompiles
    assert int(state.step) == 3
    assert np.isfinite(float(m["total_loss"][-1]))


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


def test_nonfinite_grad_step_is_skipped(setup):
    """Regression for the 576^2 stage-1 divergence: one bad batch spiked
    the loss to NaN and every later step stayed NaN.  With
    cfg.skip_nonfinite_updates (default) the non-finite update is skipped
    whole — params, Adam moments AND BN running stats untouched — and the
    next finite step trains normally (PARITY.md deviation #8)."""
    cfg, model, v = setup
    tx = ts.make_optimizer(v["params"], cfg)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))
    step = ts.make_jitted_train_step(model, tx)

    bad = make_batch(cfg)
    bad["images"] = bad["images"].at[0, 0, 0, 0].set(jnp.nan)
    state1, metrics = step(state, bad, jax.random.PRNGKey(1))
    assert not np.isfinite(float(metrics["total_loss"]))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(state1.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.opt_state.total_notfinite) == 1
    assert int(state1.step) == 1  # the step still counts (reference: a
    # diverged TF1 step also advances global_step)

    good = make_batch(cfg)
    state2, metrics2 = step(state1, good, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["total_loss"]))
    delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(state1.params["convolutional58"]),
        jax.tree.leaves(state2.params["convolutional58"])))
    assert delta > 0, "finite step after a skipped one did not train"


def test_grad_clip_norm_bounds_update(setup):
    """cfg.grad_clip_norm caps the global gradient norm before Adam.
    With Adam's normalization the *update* direction changes only when
    clipping binds unevenly across steps; here we just verify the knob
    builds, trains, and that clipped != unclipped on the first step."""
    cfg, model, v = setup
    batch = make_batch(cfg)

    def first_update(c):
        tx = ts.make_optimizer(v["params"], c)
        state = ts.TrainState(v["params"], v["batch_stats"],
                              tx.init(v["params"]), jnp.asarray(0))
        step = ts.make_jitted_train_step(model, tx)
        s1, m = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["total_loss"]))
        return np.asarray(jax.tree.leaves(s1.params["convolutional58"])[0])

    plain = first_update(cfg)
    clipped = first_update(cfg.replace(grad_clip_norm=1e-4))
    assert np.abs(plain - clipped).max() > 0
