"""Measure the K-steps-per-dispatch training loop on the real chip.

VERDICT r4 #1 "done" criterion: run a >=2k-step slice of the reference
schedule (576^2, batch 2, stride 2, save_iter-500 val/ckpt cadence —
train_yolo3_mask.py:127-160 is the host-driven per-step loop being beaten)
at K=1 (the round-4 per-step loop, 216-258 ms/step wall measured) and at
K=cfg.steps_per_dispatch, with identical seeds, and show:

  * wall ms/step reduction (target >=5x), split into train-dispatch vs
    host-load vs validation components so the residual is attributable;
  * a seed-for-seed matching loss trajectory (the K-step lax.scan block is
    the SAME train step — tests/test_train_step.py proves bit-parity on
    CPU; here we confirm the real-chip trajectories agree at every
    summary_iter step).

Also probes the raw tunnel upload floor (one stacked block device_put) so
the report can say how much of the residual is wire, not dispatch.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kstep.py \
      [--root /tmp/dyt_kstep] [--steps 2000] [--ks 1,50]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.val_data import DefectValData
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.train import checkpoint as ckpt
from dis_yolo_tpu.train import solver as solver_mod
from dis_yolo_tpu.utils.runtime import enable_compilation_cache
from dis_yolo_tpu.utils.timer import Timer

from reference_schedule import ensure_data


class LapTimer(Timer):
    """Timer that additionally records every span, so the first span (the
    XLA compile) can be excluded from the steady-state rate."""

    REGISTRY: list = []

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.laps: list = []
        LapTimer.REGISTRY.append(self)

    def _close(self, begin):
        super()._close(begin)
        self.laps.append(self.diff)


def run_once(args, k: int, corpus: bool = False) -> dict:
    cfg = DISYoloConfig(
        dataset=args.root, image_size=args.size, test_size=args.size,
        batch_size=args.batch, mask_stride=args.stride,
        summary_iter=50, save_iter=args.save_iter, grad_clip_norm=10.0,
        device_side_augs=True, max_keep_ckpt=3, steps_per_dispatch=k,
        device_corpus=corpus,
        lr_boundaries=(args.steps,), lr_values=(1e-3, 1e-3),
        output_dir=os.path.join(args.root, f"out_{'c' if corpus else ''}k{k}"),
    )
    # fresh output dir: stale checkpoints/metrics from a previous bench run
    # would poison the trajectory log and the pruning window
    import shutil
    shutil.rmtree(cfg.output_dir, ignore_errors=True)
    LapTimer.REGISTRY.clear()
    solver_mod.Timer = LapTimer           # instrument the loop's own timers
    try:
        solver = solver_mod.Solver(cfg, evaluator=Evaluator(cfg, "val"),
                                   val_data=DefectValData(cfg, "val"))
        t0 = time.time()
        solver.train(max_iter=args.steps)
        wall = time.time() - t0
    finally:
        solver_mod.Timer = Timer
    load_t, train_t = LapTimer.REGISTRY[-2], LapTimer.REGISTRY[-1]

    def rates(t: LapTimer, per_lap_steps: int):
        total = sum(t.laps)
        steady = (sum(t.laps[1:]) / ((len(t.laps) - 1) * per_lap_steps)
                  if len(t.laps) > 1 else float("nan"))
        return total, steady

    # the loop snaps K to a divisor of save_iter; recover the actual K
    # from the lap count
    k_eff = max(1, round(args.steps / max(len(train_t.laps), 1)))
    train_total, train_steady = rates(train_t, k_eff)
    load_total, load_steady = rates(load_t, k_eff)
    val_s = wall - train_total - load_total    # sweeps + ckpt + logging

    # loss trajectory at every summary step, straight from the JSONL log
    steps, losses = [], []
    with open(os.path.join(cfg.output_dir, "checkpoint",
                           "train_metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "train" and "total_loss" in rec:
                steps.append(rec["step"])
                losses.append(rec["total_loss"])
    return {
        "k_requested": k, "k_effective": k_eff, "steps": args.steps,
        "device_corpus": corpus,
        "wall_s": round(wall, 1),
        "wall_ms_per_step": round(wall / args.steps * 1e3, 2),
        "train_dispatch_s": round(train_total, 1),
        "train_ms_per_step_steady": round(train_steady * 1e3, 2),
        "host_load_s": round(load_total, 1),
        "load_ms_per_step_steady": round(load_steady * 1e3, 2),
        "val_ckpt_log_s": round(val_s, 1),
        "first_block_compile_s": round(train_t.laps[0], 1) if train_t.laps
        else None,
        "loss_steps": steps, "losses": losses,
    }


def probe_upload_floor(args, k: int) -> dict:
    """Raw tunnel bandwidth for one stacked K-step block (uint8 wire)."""
    import jax
    from dis_yolo_tpu.data.dataset import DefectTrainData
    cfg = DISYoloConfig(dataset=args.root, image_size=args.size,
                        test_size=args.size, batch_size=args.batch,
                        mask_stride=args.stride, device_side_augs=True,
                        output_dir=os.path.join(args.root, "probe"))
    data = DefectTrainData(cfg, "train", seed=0, host_augs=False)
    bats = [data.get() for _ in range(k)]
    block = {key: np.stack([b[key] for b in bats]) for key in bats[0]}
    nbytes = sum(v.nbytes for v in block.values())
    for _ in range(2):                      # warm then measure
        t0 = time.time()
        dev = jax.device_put(block)
        jax.block_until_ready(dev)
        dt = time.time() - t0
    return {"block_bytes": nbytes, "block_mb": round(nbytes / 2**20, 1),
            "upload_s": round(dt, 2),
            "mb_per_s": round(nbytes / 2**20 / dt, 1),
            "wire_ms_per_step": round(dt / k * 1e3, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_kstep")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--stride", type=int, default=2, choices=[1, 2, 4])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--save-iter", type=int, default=500)
    ap.add_argument("--train-images", type=int, default=160)
    ap.add_argument("--val-images", type=int, default=24)
    ap.add_argument("--ks", default="1,50")
    args = ap.parse_args()
    enable_compilation_cache()
    ensure_data(args.root, args.train_images, args.val_images)

    report = {"size": args.size, "batch": args.batch, "stride": args.stride,
              "steps": args.steps, "runs": []}
    ks = args.ks.split(",")   # "1,50,c50" — 'c' prefix = device corpus
    report["upload_floor"] = probe_upload_floor(
        args, max(int(str(k).lstrip("c")) for k in ks))
    print("upload floor:", json.dumps(report["upload_floor"]), flush=True)

    for k in ks:
        r = run_once(args, int(str(k).lstrip("c")),
                     corpus=str(k).startswith("c"))
        report["runs"].append(r)
        print(f"k={k}: wall {r['wall_ms_per_step']} ms/step "
              f"(train {r['train_ms_per_step_steady']}, "
              f"load {r['load_ms_per_step_steady']}, "
              f"val+ckpt {r['val_ckpt_log_s']}s)", flush=True)

    if len(report["runs"]) >= 2:
        a, b = report["runs"][0], report["runs"][-1]
        common = [s for s in a["loss_steps"] if s in set(b["loss_steps"])]
        la = {s: v for s, v in zip(a["loss_steps"], a["losses"])}
        lb = {s: v for s, v in zip(b["loss_steps"], b["losses"])}
        rel = [abs(la[s] - lb[s]) / max(abs(la[s]), 1e-9) for s in common]
        report["trajectory"] = {
            "summary_points_compared": len(common),
            "max_rel_loss_diff": round(max(rel), 6) if rel else None,
            "final_loss": {f"k{a['k_effective']}": la[common[-1]],
                           f"k{b['k_effective']}": lb[common[-1]]}
            if common else None,
        }
        report["speedup_wall"] = round(
            a["wall_ms_per_step"] / b["wall_ms_per_step"], 2)
        print(f"speedup {report['speedup_wall']}x; trajectory "
              f"{json.dumps(report['trajectory'])}", flush=True)

    out = os.path.join(args.root, "kstep_report.json")
    for r in report["runs"]:      # keep the JSON small
        r.pop("loss_steps", None), r.pop("losses", None)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
