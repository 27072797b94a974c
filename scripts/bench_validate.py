"""Solver.validate wall time: host-paste route vs device-paste route.

VERDICT r2 weak #7: the Solver's periodic val sweep fed the host
``detections_to_original`` route one batch at a time; round 3 wires the
grouped-by-size device-paste route (eval/sweep.py) into ``validate``.
This measures a full validation sweep both ways on a trained-shape model
(weights don't matter for timing) over the synthetic val split.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_validate.py \
           [--root /tmp/dyt_gen] [--size 576] [--images 24]
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
from dis_yolo_tpu.data.val_data import DefectValData
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.train.solver import Solver
from dis_yolo_tpu.utils.runtime import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_validate_bench")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")

    if not os.path.isdir(os.path.join(args.root, "val")):
        generate_dataset(args.root, phases=("train", "val"),
                         images_per_phase=args.images, image_size=600, seed=7)
        for ph in ("train", "val"):
            build_ground_truth_cache(args.root, ph)

    cfg = DISYoloConfig(dataset=args.root, image_size=args.size,
                        test_size=args.size, batch_size=args.batch,
                        output_dir=os.path.join(args.root, "out"))
    solver = Solver(cfg, evaluator=Evaluator(cfg, "val"),
                    val_data=DefectValData(cfg, "val"))

    out = {}
    for mode, device_paste in (("host_paste", False), ("device_paste", True)):
        solver.validate(device_paste=device_paste)     # compile, untimed
        times = []
        for _ in range(3):
            t0 = time.time()
            res = solver.validate(device_paste=device_paste)
            times.append(time.time() - t0)
        t = min(times)
        out[mode] = round(t, 3)
        print(f"{mode:12s}: full val sweep ({args.images} img @ {args.size}^2)"
              f" = {t:.3f} s  (device {res['t_device_s']:.3f} s)", flush=True)
    out["speedup"] = round(out["host_paste"] / out["device_paste"], 2)
    print(json.dumps(out))
    solver.data.stop()


if __name__ == "__main__":
    main()
