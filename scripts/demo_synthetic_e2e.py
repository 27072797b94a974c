#!/usr/bin/env python
"""Reproducible end-to-end demo: synthesize data, train from scratch,
evaluate mask mAP — the learning proof quoted in README.md.

Usage:
    python scripts/demo_synthetic_e2e.py [--steps 1600] [--size 256]
        [--root /tmp/dyt_synth_demo]

On a single TPU v5e this reaches mask mAP@0.5 ~ 0.67 at 1600 steps
(~11 min).  The run checkpoints every 400 steps and resumes automatically,
so it can be re-invoked under a wall-clock limit until done.
"""

import argparse
import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.dataset import DefectTrainData
from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
from dis_yolo_tpu.data.synthetic import generate_dataset
from dis_yolo_tpu.data.val_data import DefectValData
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import train_step as ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_synth_demo")
    ap.add_argument("--steps", type=int, default=1600)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--images", type=int, default=24)
    args = ap.parse_args()

    if not os.path.isdir(args.root):
        generate_dataset(args.root, phases=("train", "val"),
                         images_per_phase=args.images, image_size=300, seed=3)
        for ph in ("train", "val"):
            build_ground_truth_cache(args.root, ph)

    cfg = DISYoloConfig(dataset=args.root, image_size=args.size,
                        test_size=args.size, batch_size=args.batch_size,
                        locked_layers=())  # from scratch: train everything
    data = DefectTrainData(cfg, "train", seed=0)
    data.start_prefetch()
    model = api.create_model(cfg)
    v = api.init_variables(cfg, jax.random.PRNGKey(0))
    # reference-style decay (constant 1e-3 destabilizes the crack class
    # past ~2k steps on the tiny synthetic set)
    def lr(s):
        return jnp.where(s < 2000, 1e-3, 1e-4)
    tx = ts.make_optimizer(v["params"], cfg, lr_schedule=lr)
    state = ts.TrainState(v["params"], v["batch_stats"],
                          tx.init(v["params"]), jnp.asarray(0))

    ckpt_glob = os.path.join(args.root, "demo_weights_step*.npy")
    start = 0
    for ck in sorted(glob.glob(ckpt_glob), reverse=True):
        try:  # a kill mid-save truncates the newest file: fall back
            blob = np.load(ck, allow_pickle=True).item()
        except Exception:
            print(f"skipping corrupt checkpoint {ck}")
            continue
        p = jax.tree.map(jnp.asarray, blob["params"])
        state = ts.TrainState(p, jax.tree.map(jnp.asarray, blob["batch_stats"]),
                              tx.init(p), jnp.asarray(blob["step"]))
        start = blob["step"]
        print(f"resumed at step {start}")
        break

    step_fn = ts.make_jitted_train_step(model, tx)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(start + 1, args.steps + 1):
        batch = {k: jnp.asarray(x) for k, x in data.next_prefetched().items()}
        rng, key = jax.random.split(rng)
        state, metrics = step_fn(state, batch, key)
        if i % 200 == 0:
            print(f"step {i}: loss {float(metrics['total_loss']):.2f} "
                  f"({(time.time() - t0) / (i - start):.2f} s/step)",
                  flush=True)
        if i % 400 == 0:
            path = ckpt_glob.replace("*", f"{i:06d}")
            np.save(path + ".tmp.npy",
                    {"params": jax.tree.map(np.asarray, state.params),
                     "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
                     "step": i}, allow_pickle=True)
            os.replace(path + ".tmp.npy.npy"
                       if os.path.exists(path + ".tmp.npy.npy")
                       else path + ".tmp.npy", path)   # atomic publish
    data.stop()

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ev = Evaluator(cfg, "val", with_semantic=True)
    val = DefectValData(cfg, "val")
    images, names, windows = val.get()
    run = api.make_jitted_predict(model)
    detdata = []
    b = cfg.batch_size
    for s0 in range(0, len(names), b):
        imgs, wins = images[s0:s0 + b], windows[s0:s0 + b]
        pad = b - imgs.shape[0]
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                                  imgs.dtype)])
            wins = np.concatenate([wins, np.tile([0., 0., 1., 1.], (pad, 1))
                                  .astype(np.float32)])
        d, m = run(variables, jnp.asarray(imgs), jnp.asarray(wins))
        d, m = np.asarray(d), np.asarray(m)
        for i in range(min(b, len(names) - s0)):
            detdata.append({"imname": names[s0 + i], "boxes": d[i],
                            "masks": m[i]})
    res = ev.evaluate_detections(detdata, collect_semantic=True)
    miou = ev.miou(res.pop("semantic_maps"))
    print(json.dumps({"AP": [round(a, 3) for a in res["AP"]],
                      "mAP": round(res["mAP"], 3),
                      "miou": round(miou["miou"], 3)}))


if __name__ == "__main__":
    main()
