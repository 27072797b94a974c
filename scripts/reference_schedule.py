"""The reference's FULL two-stage training workload, end to end, at 576^2
(VERDICT r3 next #1).

Reproduces train_yolo3_mask.py's published schedule on the synthetic
corpus (the private defect dataset is unobtainable):

  pretrain  — from-scratch run standing in for the unobtainable
              ``yolov3_3class_coco.ckpt``; exported as a TF1-scope-name
              artifact so stage 1 exercises the real selective-restore
              bridge (train_yolo3_mask.py:69-107)
  stage 1   — backbone conv1-52 locked, selective restore, LR 1e-3,
              10k iters (README schedule; yolo/config.py:31)
  stage 2   — full unlock, piecewise LR 1e-3/1e-4/1e-5/1e-6 at
              10k/10k/5k/5k (train_yolo3_mask.py:134-141), 30k iters

with the reference's batch 2 (yolo/config.py:41), validation mAP sweep +
checkpoint every 500 steps (save_iter), and crash-safe auto-resume — each
phase is idempotent (restore="auto"), so killing the process mid-run and
re-launching continues from the newest checkpoint (this IS exercised for
the published run: the driver kills stage 2 once on purpose).

Wall-clock levers on the tunneled single chip: device-side augs (exact,
parity-tested), the compact uint8/bit-packed batch format (~2.5x fewer
bytes per step over the link), device prefetch, and checkpoint pruning
(keep 3; the reference's keep-all would write ~80 GB of Adam state).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/reference_schedule.py \
         [--root /tmp/dyt_ref576] [--stride 2] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
from dis_yolo_tpu.data.synthetic import generate_dataset
from dis_yolo_tpu.data.val_data import DefectValData
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import checkpoint as ckpt
from dis_yolo_tpu.train.solver import Solver
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def ensure_data(root: str, train_images: int, val_images: int):
    if not os.path.isdir(os.path.join(root, "train", "cache")):
        generate_dataset(root, phases=("train",), images_per_phase=train_images,
                         image_size=600, seed=3)
        build_ground_truth_cache(root, "train")
    if not os.path.isdir(os.path.join(root, "val", "cache")):
        generate_dataset(root, phases=("val",), images_per_phase=val_images,
                         image_size=600, seed=77)
        build_ground_truth_cache(root, "val")


def run_phase(cfg: DISYoloConfig, max_iter: int, tag: str,
              tf1_weights=None, weights_from=None) -> dict:
    """One resumable Solver phase; returns timing + final ckpt path."""
    done_marker = os.path.join(cfg.output_dir, "PHASE_DONE.json")
    if os.path.isfile(done_marker):
        with open(done_marker) as f:
            prior = json.load(f)
        if prior.get("ckpt"):
            return prior
        os.remove(done_marker)   # stale marker without a checkpoint: redo
    solver = Solver(cfg, evaluator=Evaluator(cfg, "val"),
                    val_data=DefectValData(cfg, "val"), restore="auto",
                    tf1_weights=tf1_weights, weights_from=weights_from)
    start_step = int(solver.state.step)
    t0 = time.time()
    solver.train(max_iter=max_iter)
    wall = time.time() - t0
    steps = max_iter - start_step
    if ckpt.latest_checkpoint(solver.ckpt_dir) is None or \
            int(solver.state.step) % cfg.save_iter:
        ckpt.save_checkpoint(solver.ckpt_dir, solver.state,
                             int(solver.state.step), wait=True)
    result = {
        "tag": tag, "steps_this_window": steps, "max_iter": max_iter,
        "wall_s_this_window": round(wall, 1),
        "wall_ms_per_step": round(wall / max(steps, 1) * 1e3, 1),
        "ckpt": ckpt.latest_checkpoint(solver.ckpt_dir),
        "resumed_from_step": start_step,
    }
    with open(done_marker, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[{tag}] done: {json.dumps(result)}", flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_ref576")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--stride", type=int, default=2, choices=[1, 2, 4])
    ap.add_argument("--batch", type=int, default=2)      # yolo/config.py:41
    ap.add_argument("--train-images", type=int, default=160)
    ap.add_argument("--val-images", type=int, default=24)
    ap.add_argument("--pretrain-steps", type=int, default=3000)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale the 10k/30k stage schedule (1.0 = published)")
    ap.add_argument("--clip", type=float, default=10.0,
                    help="grad_clip_norm (the published reference does not "
                         "clip, but its stability came from the mature COCO "
                         "backbone we cannot download; the first 576^2 "
                         "attempt without clipping spiked to NaN at stage-1 "
                         "step ~4.5k — PARITY.md deviation #8)")
    ap.add_argument("--k", type=int, default=50,
                    help="steps per device dispatch (lax.scan block; 1 = "
                         "the round-4 per-step loop that measured 216-258 "
                         "ms/step wall vs a 10.65 ms device step)")
    ap.add_argument("--corpus", action="store_true",
                    help="device-resident corpus: decoded dataset lives in "
                         "HBM, batches assemble on device, the host ships "
                         "~1 KB/step (cfg.device_corpus; round 5)")
    args = ap.parse_args()
    enable_compilation_cache()
    ensure_data(args.root, args.train_images, args.val_images)

    s1_steps = int(round(10000 * args.scale))            # yolo/config.py:31
    s2_steps = int(round(30000 * args.scale))
    # stage-2 piecewise boundaries 10k/20k/25k scaled alike (:134-141)
    s2_bounds = tuple(int(round(b * args.scale)) for b in (10000, 20000, 25000))

    tag = f"s{args.stride}"
    base = dict(dataset=args.root, image_size=args.size, test_size=args.size,
                batch_size=args.batch, mask_stride=args.stride,
                summary_iter=50, save_iter=500, grad_clip_norm=args.clip,
                device_side_augs=True, max_keep_ckpt=3,
                steps_per_dispatch=args.k, device_corpus=args.corpus)
    summary = {"stride": args.stride, "size": args.size, "batch": args.batch,
               "grad_clip_norm": args.clip, "steps_per_dispatch": args.k,
               "device_corpus": args.corpus,
               "schedule": {"pretrain": args.pretrain_steps,
                            "stage1": s1_steps, "stage2": s2_steps,
                            "s2_lr_boundaries": list(s2_bounds)}}
    t_all = time.time()

    # ---- pretrain (the yolov3_3class_coco.ckpt stand-in) ----
    artifact = os.path.join(args.root, f"pretrained_{tag}.npy")
    cfg0 = DISYoloConfig(**{**base, "save_iter": 1000},
                         output_dir=os.path.join(args.root, f"out_pre_{tag}"),
                         locked_layers=(),
                         lr_boundaries=(args.pretrain_steps,),
                         lr_values=(1e-3, 1e-3))
    if not os.path.isfile(artifact):
        summary["pretrain"] = run_phase(cfg0, args.pretrain_steps,
                                        f"pretrain_{tag}")
        v = api.init_variables(cfg0, __import__("jax").random.PRNGKey(0))
        p, bs = ckpt.restore_weights(summary["pretrain"]["ckpt"],
                                     v["params"], v["batch_stats"])
        np.save(artifact, ckpt.export_tf1_weights(
            {"params": p, "batch_stats": bs}), allow_pickle=True)
        print(f"[{tag}] TF1-style pretrain artifact saved", flush=True)

    # ---- stage 1: locked backbone, selective restore, constant 1e-3 ----
    cfg1 = DISYoloConfig(**base,
                         output_dir=os.path.join(args.root, f"out_s1_{tag}"),
                         locked_layers=tuple(range(1, 53)),
                         lr_boundaries=(s1_steps,), lr_values=(1e-3, 1e-3))
    summary["stage1"] = run_phase(cfg1, s1_steps, f"stage1_{tag}",
                                  tf1_weights=artifact)

    # ---- stage 2: full unlock, the published piecewise LR ----
    cfg2 = DISYoloConfig(**base,
                         output_dir=os.path.join(args.root, f"out_s2_{tag}"),
                         locked_layers=(), lr_boundaries=s2_bounds,
                         lr_values=(1e-3, 1e-4, 1e-5, 1e-6))
    summary["stage2"] = run_phase(cfg2, s2_steps, f"stage2_{tag}",
                                  weights_from=summary["stage1"]["ckpt"])

    summary["total_wall_s_this_window"] = round(time.time() - t_all, 1)

    # ---- final + best-checkpoint eval on the val split ----
    # the reference dumps val_map so the user hand-picks the peak-val
    # checkpoint for deployment (train_yolo3_mask.py:58,221-227); the
    # Solver tracks it automatically (best.json + prune protection), so
    # report BOTH the final state and the deployable best state.
    s2_ckpt_dir = os.path.join(cfg2.output_dir, "checkpoint")
    evaluator = Evaluator(cfg2, "val")
    val_data = DefectValData(cfg2, "val")
    for tag_eval, ck in (("final_val", summary["stage2"]["ckpt"]),
                         ("best_val", ckpt.best_checkpoint(s2_ckpt_dir))):
        if ck is None:
            continue
        solver_eval = Solver(cfg2, evaluator=evaluator, val_data=val_data,
                             restore=ck)
        result = solver_eval.validate()
        summary[tag_eval] = {"ckpt": ck, "mAP": result["mAP"],
                             "AP": list(result["AP"])}
        solver_eval.data.stop()
    best = ckpt.read_best(s2_ckpt_dir)
    if best:
        summary["best_tracked"] = best

    out = os.path.join(args.root, f"ref_schedule_summary_{tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
