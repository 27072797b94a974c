"""Host-loader throughput: sequential thread vs ParallelTrainData pool.

VERDICT r3 weak #1 / next #2: real training was host-bound (128.8 ms wall
vs 10.65 ms device step at 576^2 b2) because ONE GIL-bound thread assembles
examples.  This measures, host-only (no device work):

  1. loader throughput (img/s) for workers in {0 (sequential thread),
     1, 2, 4, 8} at the reference 576^2 shapes
  2. a per-stage attribution of build_example (decode, rasterize+box,
     augment+place, anchor assign) so the single-core floor is itemized
  3. the multi-core projection: floor_ms / workers, valid until the
     collate/queue overhead (measured) dominates

On a 1-core host (this sandbox) the pool cannot beat the floor — the
point of the numbers here is the itemized floor + projection; on a real
multi-core TPU host the pool scales until collate dominates.

Usage: python scripts/bench_loader.py [--root /tmp/dyt_loader_bench]
           [--size 576] [--batches 12] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def make_data(root: str, size: int) -> None:
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    from dis_yolo_tpu.data.synthetic import generate_dataset
    if os.path.isdir(os.path.join(root, "train", "cache")):
        return
    generate_dataset(root, phases=("train",), images_per_phase=16,
                     image_size=size, seed=0)
    build_ground_truth_cache(root, "train")


def bench_loader(cfg, workers: int, batches: int) -> float:
    from dis_yolo_tpu.data.dataset import DefectTrainData, ParallelTrainData
    if workers == 0:
        data = DefectTrainData(cfg, "train", seed=0)
    else:
        data = ParallelTrainData(cfg, "train", seed=0, workers=workers)
    data.start_prefetch()
    data.next_prefetched()          # warm caches / spin up pool
    data.next_prefetched()
    t0 = time.perf_counter()
    for _ in range(batches):
        data.next_prefetched()
    dt = time.perf_counter() - t0
    data.stop()
    return dt / batches


def stage_attribution(cfg, reps: int = 20) -> dict:
    """Itemize one example's assembly cost on this host."""
    from dis_yolo_tpu.data import augment, rasterize
    from dis_yolo_tpu.data.dataset import (_read_image, assign_anchors,
                                           build_example, load_labels)
    label = load_labels(cfg, "train")[0]
    net = cfg.image_size

    def t(fn):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps * 1e3

    image = _read_image(label["imname"])
    ih, iw = image.shape[:2]
    polys = label["polygons"][: cfg.max_box_per_image]
    masks = rasterize.instance_masks(polys, ih, iw, len(polys))
    boxes = np.stack([rasterize.mask_to_box(m) for m in masks]).astype(np.float32)
    cxywh = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                      (boxes[:, 1] + boxes[:, 3]) / 2,
                      boxes[:, 2] - boxes[:, 0],
                      boxes[:, 3] - boxes[:, 1]], axis=1)
    classids = np.zeros(len(boxes), np.int64)
    rng = np.random.RandomState(0)

    out = {
        "decode_ms": t(lambda: _read_image(label["imname"])),
        "rasterize_ms": t(lambda: rasterize.instance_masks(polys, ih, iw, len(polys))),
        "place_image_ms": t(lambda: augment.place_and_pad(
            image, net, net, 0, 0, net, net, pad_value=127)),
        "place_masks_ms": t(lambda: [augment.place_and_pad(
            m.astype(np.float32), net, net, 0, 0, net, net, 0.0) for m in masks]),
        "photometric_ms": t(lambda: augment.apply_photometric(
            np.ascontiguousarray(image[:net, :net]).astype(np.uint8), 2,
            np.random.RandomState(0))),
        "assign_anchors_ms": t(lambda: assign_anchors(cxywh, classids, cfg)),
        "full_example_ms": t(lambda: build_example(cfg, label,
                                                   np.random.RandomState(0),
                                                   True)),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dyt_loader_bench")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    from dis_yolo_tpu.config import DISYoloConfig
    make_data(args.root, args.size)
    cfg = DISYoloConfig(dataset=args.root, image_size=args.size,
                        test_size=args.size, batch_size=args.batch)

    cores = os.cpu_count() or 1
    print(json.dumps({"host_cores": cores, "size": args.size,
                      "batch": args.batch}))

    stages = stage_attribution(cfg)
    print(json.dumps({"stage_attribution": {k: round(v, 2)
                                            for k, v in stages.items()}}))

    rows = {}
    for w in (0, 1, 2, 4, 8):
        ms = bench_loader(cfg, w, args.batches) * 1e3
        rows[w] = ms
        print(json.dumps({"workers": w, "ms_per_batch": round(ms, 1),
                          "img_per_s": round(args.batch / ms * 1e3, 1)}))

    floor = stages["full_example_ms"]
    print(json.dumps({
        "single_core_floor_ms_per_img": round(floor, 2),
        "projection": {f"{c}_cores_img_per_s": round(c / floor * 1e3, 1)
                       for c in (1, 8, 32)},
    }))


if __name__ == "__main__":
    main()
