"""int8 post-training quantization: math parity + end-to-end closeness."""

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables
from dis_yolo_tpu.models.quant import (QuantConv, calibrate_deploy,
                                       quantize_deploy)


def _np_quant_conv(x, w, b, act_absmax, alpha=0.1):
    """Literal numpy reproduction of QuantConv's serving math.

    Mirrors the implementation bit-for-bit where rounding matters: the
    activation quant multiplies by a f32 reciprocal (not divides), so a
    value landing near a .5 boundary rounds identically.
    """
    s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0),
                     1e-12) / 127.0
    s_x = max(act_absmax, 1e-12) / 127.0
    inv_sx = np.float32(1.0 / s_x)
    w_q = np.clip(np.round(w / s_w), -127, 127)
    x_q = np.clip(np.round(x.astype(np.float32) * inv_sx), -127, 127)
    kh, kw, ci, co = w.shape
    xp = np.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros(x.shape[:3] + (co,), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + x.shape[1], j:j + x.shape[2], :]
            out += np.tensordot(patch, w_q[i, j], axes=([3], [0]))
    y = out * (s_x * s_w).astype(np.float32) + b
    return np.maximum(alpha * y, y)


def test_quantconv_matches_numpy(rng):
    x = rng.uniform(-2, 2, (1, 8, 8, 5)).astype(np.float32)
    w = rng.randn(3, 3, 5, 7).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    absmax = float(np.abs(x).max())

    qvars = quantize_deploy({"params": {"layer": {"conv": {
        "kernel": w, "bias": b}}}}, {"layer": absmax})
    mod = QuantConv(features=7, kernel=3, dtype=jnp.float32)
    got = mod.apply({"params": qvars["params"]["layer"]}, jnp.asarray(x))
    want = _np_quant_conv(x, w, b, absmax)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quant_model_close_to_deploy(small_cfg, rng):
    cfg = small_cfg.replace(quant_layers=tuple(range(1, 86)))  # all-quant
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    _, stats = api.forward(model, v, img, train=True)
    dv = deploy_variables({"params": v["params"], "batch_stats": stats})

    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    absmax = calibrate_deploy(cmodel, dv, img)
    # every conv_bn layer calibrated; bias head convs excluded
    assert "convolutional1" in absmax and "convolutional81" in absmax
    assert "convolutional82" not in absmax        # stride-2 head bias conv
    assert all(a > 0 for a in absmax.values())

    qv = quantize_deploy(dv, absmax)
    qmodel = api.create_model(cfg.replace(quant=True))
    out_f = api.forward(api.create_model(cfg.replace(deploy=True)), dv, img)
    out_q = api.forward(qmodel, qv, img)
    for i, (a, b) in enumerate(zip(out_f, out_q)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(a).mean() + 1e-6
        rel = np.abs(a - b).mean() / scale
        assert rel < 0.25, f"output {i}: normalized MAE {rel:.3f}"
        # shapes and broad structure preserved
        assert a.shape == b.shape


def test_quant_predict_runs_hybrid(small_cfg, rng):
    """Default hybrid mode: stem conv1-4 stays float deploy, rest int8."""
    cfg = small_cfg
    v = api.init_variables(cfg, jax.random.PRNGKey(1))
    dv = deploy_variables(v)
    img = jnp.asarray(rng.rand(1, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    absmax = calibrate_deploy(cmodel, dv, img)
    assert "convolutional1" not in absmax        # stem not quantized
    assert "convolutional5" in absmax
    qv = quantize_deploy(dv, absmax)
    assert set(qv["params"]["convolutional1"]) == {"conv"}   # float deploy
    assert qv["params"]["convolutional5"]["w_q"].dtype == jnp.int8
    qmodel = api.create_model(cfg.replace(quant=True))
    dets, masks = api.predict(qmodel, qv, img,
                              jnp.asarray([[0., 0., 1., 1.]]),
                              obj_thresh=1e-6)
    assert dets.shape == (1, cfg.max_detection, 6)
    assert masks.shape[1] == cfg.max_detection
    assert np.isfinite(np.asarray(dets)).all()


def test_percentile_calibration(small_cfg, rng):
    """pct scales: <= absmax, ordered with the percentile, and the graph
    still serves (outlier-robust alternative, VERDICT r2 #9)."""
    cfg = small_cfg
    v = api.init_variables(cfg, jax.random.PRNGKey(1))
    dv = deploy_variables(v)
    img = jnp.asarray(rng.rand(2, cfg.image_size, cfg.image_size, 3)
                      .astype(np.float32))
    cmodel = api.create_model(cfg.replace(quant=True, quant_calibrate=True))
    mx = calibrate_deploy(cmodel, dv, img, use_pct=False)
    p999 = calibrate_deploy(cmodel, dv, img, use_pct=True)
    cmodel50 = api.create_model(cfg.replace(quant=True, quant_calibrate=True,
                                            quant_calib_pct=50.0))
    p50 = calibrate_deploy(cmodel50, dv, img, use_pct=True)
    for name in mx:
        assert p999[name] <= mx[name] + 1e-6, name
        assert p50[name] <= p999[name] + 1e-6, name
        assert p50[name] > 0, name
    qv = quantize_deploy(dv, p999)
    qmodel = api.create_model(cfg.replace(quant=True))
    dets, _ = api.predict(qmodel, qv, img[:1],
                          jnp.asarray([[0., 0., 1., 1.]]), obj_thresh=1e-6)
    assert np.isfinite(np.asarray(dets)).all()
