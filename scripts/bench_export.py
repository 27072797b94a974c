"""Validate + time the AOT serving artifact (export.py) on the real chip.

Proves three things the CPU unit tests cannot:

1. the TPU export round-trips with the Pallas assembly kernel inside
   (``tpu_custom_call`` serialization via DisabledSafetyCheck),
2. the deserialized artifact computes exactly what live predict computes,
3. artifact serving pays no latency tax: chain-scan time of the
   deserialized call vs the live jitted predict.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_export.py
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from dis_yolo_tpu import export as exp
from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.models import api
from dis_yolo_tpu.models.fold import deploy_variables
from dis_yolo_tpu.utils.profiling import chain_scan_time
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    cfg = DISYoloConfig(batch_size=1).replace(deploy=True)
    base = DISYoloConfig(batch_size=1)
    v = api.init_variables(base, jax.random.PRNGKey(0))
    dv = deploy_variables(v)

    # --- export (try the Pallas path first, fall back with a note) -------
    exported = None
    for pallas in (True, False):
        try:
            exported = exp.export_predict(cfg, dv, batch_size=1,
                                          platforms=("tpu",), pallas=pallas)
            print(f"export ok: pallas={pallas}, "
                  f"platforms={exported.platforms}")
            break
        except Exception as e:  # noqa: BLE001 - report and try next
            print(f"export with pallas={pallas} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}")
    if exported is None:
        raise SystemExit("export failed for both formulations")

    with tempfile.TemporaryDirectory() as td:
        blob = exp.save_artifact(exported, os.path.join(td, "m"), cfg)
        size_mb = os.path.getsize(blob) / 1e6
        print(f"artifact: {size_mb:.1f} MB")
        run_art, meta = exp.load_artifact(os.path.join(td, "m"))

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, cfg.test_size, cfg.test_size, 3)
                          .astype(np.float32))
        win = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)

        model = api.create_model(cfg)
        live = api.make_jitted_predict(model)
        d_live, m_live = jax.block_until_ready(live(dv, img, win))
        d_art, m_art = jax.block_until_ready(run_art(img, win))
        np.testing.assert_array_equal(np.asarray(d_live), np.asarray(d_art))
        np.testing.assert_array_equal(np.asarray(m_live), np.asarray(m_art))
        print("artifact outputs == live predict (bit-exact)")

        def body_live(x):
            d, m = live(dv, x, win)
            return d[..., 4].sum() + m.astype(jnp.float32).sum() * 1e-9

        def body_art(x):
            d, m = run_art(x, win)
            return d[..., 4].sum() + m.astype(jnp.float32).sum() * 1e-9

        t_live = chain_scan_time(body_live, img, n=10)
        t_art = chain_scan_time(body_art, img, n=10)
        print(json.dumps({"live_s_per_image": round(t_live, 6),
                          "artifact_s_per_image": round(t_art, 6),
                          "artifact_mb": round(size_mb, 1)}))

    # --- shape-polymorphic artifact: ONE blob serves every batch size ----
    # (VERDICT r3 next #5 — the analog of the reference graph's
    # [None, None, None, 3] placeholder, yolo3_net_pos.py:44.)  Symbolic
    # batch pins the jnp assembly (bit-identical to Pallas); the table
    # below is the measured latency tax of that portability.
    exported_sym = exp.export_predict(cfg, dv, batch_size="b",
                                      platforms=("tpu",))
    print(f"symbolic export ok: in_avals={exported_sym.in_avals[0].shape}")
    with tempfile.TemporaryDirectory() as td:
        blob = exp.save_artifact(exported_sym, os.path.join(td, "sym"), cfg)
        size_mb = os.path.getsize(blob) / 1e6
        run_sym, meta = exp.load_artifact(os.path.join(td, "sym"))
        model = api.create_model(cfg)
        live = api.make_jitted_predict(model)
        out = {"symbolic_artifact_mb": round(size_mb, 1)}
        for b in (1, 8):
            rng = np.random.RandomState(b)
            img = jnp.asarray(rng.rand(b, cfg.test_size, cfg.test_size, 3)
                              .astype(np.float32))
            win = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32),
                           (b, 1))
            d_live, m_live = jax.block_until_ready(live(dv, img, win))
            d_art, m_art = jax.block_until_ready(run_sym(img, win))
            # live uses the Pallas assembly, the artifact the jnp one —
            # bit-identical formulations (tests/test_pallas_assembly.py)
            np.testing.assert_array_equal(np.asarray(d_live),
                                          np.asarray(d_art))
            np.testing.assert_array_equal(np.asarray(m_live),
                                          np.asarray(m_art))

            def body(x, b=b):
                d, m = run_sym(x, win)
                return d[..., 4].sum() + m.astype(jnp.float32).sum() * 1e-9

            t = chain_scan_time(body, img, n=10)
            out[f"symbolic_b{b}_s_per_image"] = round(t / b, 6)
        print("one symbolic artifact served b1 AND b8, outputs == live")
        print(json.dumps(out))


if __name__ == "__main__":
    main()
