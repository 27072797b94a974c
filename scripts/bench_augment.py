"""Host-augs vs device-augs train wall-clock (VERDICT r2 #5 measurement).

The device-side augmentation path (data/device_augment.py, now *exact* vs
the host path) only earns its keep if it buys train-loop wall time — the
host augs run in the prefetch thread and may be fully hidden behind device
compute.  This measures real steps/s over a synthetic-dataset train loop
for both settings at the reference shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_augment.py \
           [--root /tmp/dyt_aug_bench] [--size 576] [--steps 60]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
from dis_yolo_tpu.data.synthetic import generate_dataset
from dis_yolo_tpu.train.solver import Solver
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def run_mode(root: str, size: int, steps: int, device_augs: bool,
             batch: int) -> float:
    cfg = DISYoloConfig(
        dataset=root, image_size=size, test_size=size, batch_size=batch,
        device_side_augs=device_augs, summary_iter=10_000,
        save_iter=10_000,   # no validation sweeps inside the timed window
        output_dir=os.path.join(root, f"out_{'dev' if device_augs else 'host'}"))
    solver = Solver(cfg)
    # warm up: compile + fill prefetch
    solver.train(max_iter=5)
    t0 = time.time()
    solver.train(max_iter=5 + steps)
    dt = time.time() - t0
    solver.data.stop()
    return dt / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_aug_bench")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")

    if not os.path.isdir(os.path.join(args.root, "train")):
        generate_dataset(args.root, phases=("train",), images_per_phase=16,
                         image_size=600, seed=5)
        build_ground_truth_cache(args.root, "train")

    t_host = run_mode(args.root, args.size, args.steps, False, args.batch)
    print(f"host augs  : {t_host*1e3:.2f} ms/step", flush=True)
    t_dev = run_mode(args.root, args.size, args.steps, True, args.batch)
    print(f"device augs: {t_dev*1e3:.2f} ms/step", flush=True)
    print(json.dumps({"host_ms_per_step": round(t_host * 1e3, 2),
                      "device_ms_per_step": round(t_dev * 1e3, 2),
                      "speedup": round(t_host / t_dev, 3)}))


if __name__ == "__main__":
    main()
