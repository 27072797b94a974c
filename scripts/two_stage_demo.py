#!/usr/bin/env python
"""Two-stage transfer-learning schedule end-to-end on synthetic data.

Reproduces the reference training story (train_yolo3_mask.py) scaled down:

  phase 0 — "pretrain" analog: a short from-scratch full train whose
    weights are exported with ``export_tf1_weights`` to a reference-named
    artifact.  (The real ``yolov3_3class_coco.ckpt`` is a Google-Drive
    download not present in this environment; this self-pretrained backbone
    artifact exercises the identical restore path.)
  phase 1 — stage 1: fresh model, backbone conv1-52 LOCKED, selective
    restore of backbone + detection-head layers from the artifact
    (train_yolo3_mask.py:69-107 include-list); mask subnet from scratch;
    constant LR 1e-3 (:129-131).  Validation mAP recorded.
  phase 2 — stage 2: ``weights_from`` bridge (params + BN stats carried
    over, optimizer + step reset — :109-114), ALL layers unlocked,
    piecewise LR 1e-3 -> 1e-6 scaled to the run length (:134-141).
    Asserts the bridge preserved BN statistics exactly and reports whether
    stage 2 improved the stage-1 mAP.

Resumable: each phase checkpoints via the Solver and auto-resumes.

Usage:
  PYTHONPATH=/root/.axon_site:. python scripts/two_stage_demo.py \
      [--root /tmp/dyt_two_stage] [--size 256] [--pretrain-steps 800]
      [--stage1-steps 600] [--stage2-steps 900]
"""

import argparse
import json
import os

import jax
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
from dis_yolo_tpu.data.synthetic import generate_dataset
from dis_yolo_tpu.data.val_data import DefectValData
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.train import checkpoint as ckpt
from dis_yolo_tpu.train.solver import Solver
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def make_cfg(args, **kw):
    base = dict(dataset=args.root, image_size=args.size, test_size=args.size,
                batch_size=args.batch_size, summary_iter=100)
    base.update(kw)
    return DISYoloConfig(**base)


def run_phase(cfg, name, steps, evaluator, val, **solver_kw):
    print(f"=== {name}: {steps} steps, locked={cfg.locked_layers} "
          f"lr={cfg.lr_values}@{cfg.lr_boundaries}", flush=True)
    solver = Solver(cfg, evaluator=evaluator, val_data=val,
                    restore="auto", **solver_kw)
    state = solver.train(max_iter=steps)
    result = solver.validate()
    print(f"{name}: mAP@0.5 = {result['mAP']:.3f} AP = "
          f"{['%.3f' % a for a in result['AP']]}", flush=True)
    return solver, state, result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_two_stage")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--pretrain-steps", type=int, default=800)
    ap.add_argument("--stage1-steps", type=int, default=600)
    ap.add_argument("--stage2-steps", type=int, default=900)
    args = ap.parse_args()
    enable_compilation_cache()

    if not os.path.isdir(args.root):
        generate_dataset(args.root, phases=("train", "val"),
                         images_per_phase=args.images, image_size=300, seed=3)
        for ph in ("train", "val"):
            build_ground_truth_cache(args.root, ph)

    # ---- phase 0: self-pretrained backbone artifact ----------------------
    artifact = os.path.join(args.root, "pretrained_tf1_style.npy")
    cfg0 = make_cfg(args, output_dir=os.path.join(args.root, "out_pretrain"),
                    locked_layers=(), save_iter=args.pretrain_steps,
                    lr_boundaries=(args.pretrain_steps,), lr_values=(1e-3, 1e-3))
    if not os.path.isfile(artifact):
        evaluator = Evaluator(cfg0, "val")
        val = DefectValData(cfg0, "val")
        _, state, res0 = run_phase(cfg0, "pretrain", args.pretrain_steps,
                                   evaluator, val)
        dump = ckpt.export_tf1_weights(
            {"params": state.params, "batch_stats": state.batch_stats})
        np.save(artifact, dump, allow_pickle=True)
        print(f"pretrain artifact: {len(dump)} tensors -> {artifact}")

    # ---- phase 1: stage 1 (backbone locked, selective restore) -----------
    cfg1 = make_cfg(args, output_dir=os.path.join(args.root, "out_stage1"),
                    locked_layers=tuple(range(1, 53)),
                    save_iter=args.stage1_steps,
                    lr_boundaries=(args.stage1_steps,),
                    lr_values=(1e-3, 1e-3))
    evaluator = Evaluator(cfg1, "val")
    val = DefectValData(cfg1, "val")
    solver1, state1, res1 = run_phase(cfg1, "stage1", args.stage1_steps,
                                      evaluator, val, tf1_weights=artifact)
    ck1 = ckpt.latest_checkpoint(solver1.ckpt_dir)
    assert ck1, "stage-1 run produced no checkpoint"

    # ---- phase 2: stage 2 (full unlock, weights bridge, piecewise LR) ----
    s2 = args.stage2_steps
    cfg2 = make_cfg(args, output_dir=os.path.join(args.root, "out_stage2"),
                    locked_layers=(), save_iter=s2,
                    lr_boundaries=(int(s2 * 0.4), int(s2 * 0.7), int(s2 * 0.85)),
                    lr_values=(1e-3, 1e-4, 1e-5, 1e-6))
    solver2 = Solver(cfg2, evaluator=evaluator, val_data=val,
                     restore="auto", weights_from=ck1)

    # bridge invariant: BN statistics carried over exactly
    # (train_yolo3_mask.py:109-111 full-var restore)
    if int(solver2.state.step) == 0:  # fresh bridge (not an auto-resume)
        p1, bs1 = ckpt.restore_weights(ck1, state1.params, state1.batch_stats)
        mism = jax.tree_util.tree_leaves(jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            solver2.state.batch_stats, bs1))
        assert max(mism) == 0.0, f"bridge altered BN stats (max {max(mism)})"
        print("bridge check: BN statistics preserved exactly")

    state2 = solver2.train(max_iter=s2)
    res2 = solver2.validate()
    print(f"stage2: mAP@0.5 = {res2['mAP']:.3f} AP = "
          f"{['%.3f' % a for a in res2['AP']]}", flush=True)

    summary = {"stage1_mAP": res1["mAP"], "stage2_mAP": res2["mAP"],
               "stage1_AP": res1["AP"], "stage2_AP": res2["AP"],
               "improved": res2["mAP"] > res1["mAP"]}
    with open(os.path.join(args.root, "two_stage_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
