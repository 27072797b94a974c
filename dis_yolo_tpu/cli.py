"""Command-line interface: preprocess / train / eval / infer / export /
convert-tf1 / convert-darknet.

The reference has no CLI flags at all (scripts edited by hand +
``cfg.BATCH_SIZE = 1`` runtime mutation, calculate_test_map.py:354); this
argparse front-end exposes the same workflows as subcommands.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p):
    p.add_argument("--dataset", default="data", help="dataset root directory")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--image-size", type=int, default=576)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mask-stride", type=int, default=2, choices=[1, 2, 4],
                   help="mask-decoder output stride (reference variants)")
    p.add_argument("--k-map", type=int, default=3,
                   help="k for the k^2 position-sensitive score maps")


def _make_cfg(args, **overrides):
    from dis_yolo_tpu.config import DISYoloConfig
    kw = dict(dataset=args.dataset, output_dir=args.output_dir,
              image_size=args.image_size, test_size=args.image_size,
              batch_size=args.batch_size,
              mask_stride=getattr(args, "mask_stride", 2),
              k_map=getattr(args, "k_map", 3))
    kw.update(overrides)
    return DISYoloConfig(**kw)


def cmd_preprocess(args):
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    annos = build_ground_truth_cache(args.dataset, args.phase, force=args.force)
    print(f"{args.phase}: {len(annos)} annotated images cached")


def cmd_synth(args):
    from dis_yolo_tpu.data.preprocess import build_ground_truth_cache
    from dis_yolo_tpu.data.synthetic import generate_dataset
    generate_dataset(args.dataset, images_per_phase=args.images,
                     image_size=args.size, seed=args.seed)
    for phase in ("train", "val", "test"):
        build_ground_truth_cache(args.dataset, phase)
    print(f"synthetic dataset at {args.dataset}")


def cmd_train(args):
    from dis_yolo_tpu.data.val_data import DefectValData
    from dis_yolo_tpu.eval.map_eval import Evaluator
    from dis_yolo_tpu.parallel.sharding import make_mesh
    from dis_yolo_tpu.train.solver import Solver

    locked = tuple(range(1, 53)) if args.stage == 1 else ()
    extra = {}
    if getattr(args, "device_corpus", False):
        # pixels live in HBM; requires the device-side aug path
        extra.update(device_corpus=True, device_side_augs=True)
    cfg = _make_cfg(args, locked_layers=locked, max_iter=args.max_iter,
                    save_iter=args.save_iter, summary_iter=args.summary_iter,
                    steps_per_dispatch=args.steps_per_dispatch, **extra)
    mesh = make_mesh() if args.data_parallel else None
    evaluator = val = None
    if not args.no_validation:
        evaluator = Evaluator(cfg, "val")
        val = DefectValData(cfg, "val")
    solver = Solver(cfg, evaluator=evaluator, val_data=val, mesh=mesh,
                    seed=args.seed, restore=args.restore,
                    weights_from=args.weights_from,
                    tf1_weights=args.tf1_weights)
    solver.train()


def cmd_eval(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dis_yolo_tpu.data.val_data import DefectValData
    from dis_yolo_tpu.eval.map_eval import Evaluator
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.train import checkpoint as ckpt

    cfg = _make_cfg(args)
    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        p, bs = ckpt.restore_weights(args.checkpoint, variables["params"],
                                     variables["batch_stats"])
        variables = {"params": p, "batch_stats": bs}

    evaluator = Evaluator(cfg, args.phase, with_semantic=True)
    val = DefectValData(cfg, args.phase)
    images, names, windows = val.get()

    if getattr(args, "quant", False):
        # int8 serving graph: deploy-fold, calibrate activation scales,
        # quantize (models/quant.py; hybrid layer set per cfg.quant_layers).
        # Calibration prefers TRAIN-split images so the reported metrics
        # carry no calibration-on-test leakage (advisor r2 finding); falls
        # back to the eval split (with a note) when no train split exists.
        from dis_yolo_tpu.models.fold import deploy_variables
        from dis_yolo_tpu.models.quant import (calibrate_deploy,
                                               quantize_deploy)
        n_calib = int(getattr(args, "quant_calib_images", 8) or 8)
        try:
            calib_imgs = DefectValData(cfg, "train").get()[0][:n_calib]
        except Exception:
            calib_imgs = images[:n_calib]
            print("note: no train split found - calibrating on eval images "
                  "(activation-range leakage only)")
        dv = deploy_variables(variables)
        use_pct = getattr(args, "quant_calib", "max") == "pct"
        cmodel = api.create_model(cfg.replace(quant=True,
                                              quant_calibrate=True))
        absmax = calibrate_deploy(cmodel, dv, jnp.asarray(calib_imgs),
                                  use_pct=use_pct)
        variables = quantize_deploy(dv, absmax)
        model = api.create_model(cfg.replace(quant=True))
        print(f"int8 graph: {len(absmax)} layers quantized "
              f"({'pct' if use_pct else 'max'} scales, "
              f"{len(calib_imgs)} calib images)")
    mesh = None
    if getattr(args, "data_parallel", False):
        from dis_yolo_tpu.parallel.sharding import make_mesh, replicate
        mesh = make_mesh()
        # checkpoint restore commits weights to one device; spread them
        variables = replicate(mesh, variables)

    # shared sweep driver (eval/sweep.py — also used by Solver.validate);
    # compiles are excluded from the timing like the reference's published
    # steady-state number
    from dis_yolo_tpu.eval.sweep import run_split
    device_score = bool(getattr(args, "device_score", False))
    detdata, t_pred = run_split(
        cfg, model, variables, images, names, windows,
        device_paste=bool(getattr(args, "device_paste", False)),
        gt_sizes=evaluator.gt_sizes, mesh=mesh, want_semantic=True,
        device_score=device_score, gt_records=evaluator.gt_masks,
        gt_semantic=evaluator.gt_semantic if device_score else None)
    if device_score:
        # fully device-scored: IoU matrices for mAP + confusion totals for
        # mIoU came back in the detdata entries — no per-pixel fetch
        res = evaluator.evaluate_detections(detdata)
        miou = evaluator.miou_from_confusions(
            {d["imname"]: d["confusion"] for d in detdata})
    else:
        res = evaluator.evaluate_detections(detdata, collect_semantic=True)
        miou = evaluator.miou(res.pop("semantic_maps"))
    n_timed = max(len(names), 1)
    t_post = res.pop("t_post_s")
    # device-predict vs host crop/assemble split, like the reference's
    # separate prints (calculate_test_map.py:301-302)
    print(json.dumps({"AP": res["AP"], "mAP": res["mAP"],
                      "recall": res["recall"], "precision": res["precision"],
                      "iou": miou["iou"], "miou": miou["miou"],
                      "s_per_image": (t_pred + t_post) / n_timed,
                      "s_per_image_device": t_pred / n_timed,
                      "s_per_image_post": t_post / n_timed}))


def cmd_verify_gt(args):
    from dis_yolo_tpu.utils.visualize import render_groundtruth
    paths = render_groundtruth(args.dataset, args.phase, limit=args.limit)
    print(f"wrote {len(paths)} verification overlays")


def cmd_infer(args):
    """Single-image / directory inference with overlay output."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import cv2
    from dis_yolo_tpu.data.val_data import letterbox_image
    from dis_yolo_tpu.eval.postprocess import detections_to_original
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.models.fold import fold_batchnorm
    from dis_yolo_tpu.train import checkpoint as ckpt
    from dis_yolo_tpu.utils.visualize import draw_instances

    cfg = _make_cfg(args, batch_size=1)

    paths = ([os.path.join(args.images, f) for f in sorted(os.listdir(args.images))
              if f.lower().endswith((".jpg", ".png", ".jpeg"))]
             if os.path.isdir(args.images) else [args.images])

    if getattr(args, "artifact", None):
        # serve from an exported StableHLO artifact: no model code, no
        # checkpoint — the weights are baked into the module (export.py)
        from dis_yolo_tpu.export import load_artifact
        run_art, meta = load_artifact(args.artifact)
        art_cfg = meta.get("config", {})
        size = int(art_cfg.get("test_size", cfg.test_size))
        bsz = int(meta.get("in_shapes", [[1]])[0][0])
        classes = tuple(art_cfg.get("classes", cfg.classes))
        os.makedirs(args.out, exist_ok=True)
        for path in paths:
            bgr = cv2.imread(path)
            if bgr is None:
                raise SystemExit(f"error: cannot read image {path!r}")
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            h, w = rgb.shape[:2]
            canvas, window = letterbox_image(rgb, size)
            # pad the single image to the artifact's fixed batch
            imgs = np.zeros((bsz, size, size, 3), np.float32)
            wins = np.tile(np.asarray(window, np.float32), (bsz, 1))
            imgs[0] = canvas
            dets, masks = run_art(jnp.asarray(imgs), jnp.asarray(wins))
            insts = detections_to_original(np.asarray(dets[0]),
                                           np.asarray(masks[0]), h, w, size)
            rendered = draw_instances(rgb, [
                {"classname": classes[i["classid"]], "mask": i["mask"],
                 "box": i["box"], "score": i["score"]} for i in insts])
            out_path = os.path.join(args.out, os.path.basename(path))
            cv2.imwrite(out_path, cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
            print(f"{path}: {len(insts)} detections -> {out_path}")
        return

    model = api.create_model(cfg)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        p, bs = ckpt.restore_weights(args.checkpoint, variables["params"],
                                     variables["batch_stats"])
        variables = {"params": p, "batch_stats": bs}

    if getattr(args, "quant", False):
        # int8 serving for folder inference (same graph as eval --quant);
        # no train split here, so activation scales calibrate on the first
        # letterboxed inputs themselves — fine for serving, where the
        # inputs ARE the deployment distribution.
        from dis_yolo_tpu.models.fold import deploy_variables
        from dis_yolo_tpu.models.quant import (calibrate_deploy,
                                               quantize_deploy)
        calib = []
        for path in paths[:8]:
            bgr = cv2.imread(path)
            if bgr is None:
                raise SystemExit(f"error: cannot read image {path!r}")
            canvas, _ = letterbox_image(
                cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), cfg.test_size)
            calib.append(canvas)
        dv = deploy_variables(variables)
        cmodel = api.create_model(cfg.replace(quant=True,
                                              quant_calibrate=True))
        scales = calibrate_deploy(cmodel, dv, jnp.asarray(np.stack(calib)),
                                  use_pct=args.quant_calib == "pct")
        variables = quantize_deploy(dv, scales)
        model = api.create_model(cfg.replace(quant=True))
        print(f"int8 graph: {len(scales)} layers quantized "
              f"({args.quant_calib} scales, {len(calib)} calib images)")
    else:
        variables = fold_batchnorm(model, variables)
    run = api.make_jitted_predict(model, obj_thresh=args.threshold)

    os.makedirs(args.out, exist_ok=True)
    for path in paths:
        bgr = cv2.imread(path)
        if bgr is None:
            raise SystemExit(f"error: cannot read image {path!r}")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]
        canvas, window = letterbox_image(rgb, cfg.test_size)
        dets, masks = run(variables, jnp.asarray(canvas[None]),
                          jnp.asarray(window[None]))
        insts = detections_to_original(np.asarray(dets[0]), np.asarray(masks[0]),
                                       h, w, cfg.test_size)
        rendered = draw_instances(rgb, [
            {"classname": cfg.classes[i["classid"]], "mask": i["mask"],
             "box": i["box"], "score": i["score"]} for i in insts])
        out_path = os.path.join(args.out, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
        print(f"{path}: {len(insts)} detections -> {out_path}")


def cmd_export(args):
    """Serialize the serving graph (weights baked in) to a StableHLO
    artifact — the reference's frozen-checkpoint deployment
    (calculate_test_map.py:182-185) as a self-contained AOT module."""
    import jax
    import jax.numpy as jnp
    from dis_yolo_tpu import export as exp
    from dis_yolo_tpu.data.val_data import DefectValData
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.models.fold import deploy_variables
    from dis_yolo_tpu.train import checkpoint as ckpt

    bs = getattr(args, "symbolic_batch", None) or args.batch_size
    cfg = _make_cfg(args, batch_size=bs if isinstance(bs, int) else 1)
    variables = api.init_variables(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        p, bs = ckpt.restore_weights(args.checkpoint, variables["params"],
                                     variables["batch_stats"])
        variables = {"params": p, "batch_stats": bs}

    dv = deploy_variables(variables)
    if args.quant:
        from dis_yolo_tpu.models.quant import (calibrate_deploy,
                                               quantize_deploy)
        n_calib = args.quant_calib_images
        try:
            calib = DefectValData(cfg, "train").get()[0][:n_calib]
        except Exception:
            raise SystemExit("error: --quant export calibrates on the "
                             "train split; none found under --dataset")
        cmodel = api.create_model(cfg.replace(quant=True,
                                              quant_calibrate=True))
        scales = calibrate_deploy(cmodel, dv, jnp.asarray(calib),
                                  use_pct=args.quant_calib == "pct")
        serve_vars = quantize_deploy(dv, scales)
        serve_cfg = cfg.replace(quant=True)
    else:
        serve_vars = dv
        serve_cfg = cfg.replace(deploy=True)

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    exported = exp.export_predict(serve_cfg, serve_vars,
                                  batch_size=bs,
                                  obj_thresh=args.threshold,
                                  platforms=platforms)
    blob = exp.save_artifact(exported, args.out, serve_cfg,
                             obj_thresh=args.threshold,
                             extra_meta={"quant": bool(args.quant),
                                         "checkpoint": args.checkpoint})
    print(json.dumps({
        "artifact": blob, "meta": args.out + ".json",
        "platforms": list(exported.platforms),
        "batch_size": bs, "image_size": cfg.test_size,
        "bytes": os.path.getsize(blob)}))


def cmd_convert_tf1(args):
    import numpy as np
    from dis_yolo_tpu.train.checkpoint import convert_tf1_checkpoint
    values = convert_tf1_checkpoint(args.ckpt)
    np.save(args.out, values, allow_pickle=True)
    print(f"saved {len(values)} tensors to {args.out}")


def cmd_convert_darknet(args):
    import jax
    import numpy as np
    from dis_yolo_tpu.config import DISYoloConfig
    from dis_yolo_tpu.models import api
    from dis_yolo_tpu.train.checkpoint import read_darknet_weights
    cfg = DISYoloConfig(classes=tuple(f"class{i}"
                                      for i in range(args.num_class)))
    # shapes only — eval_shape skips the 61M-param init compute
    shapes = jax.eval_shape(
        lambda: api.init_variables(cfg, jax.random.PRNGKey(0),
                                   image_size=64))
    values = read_darknet_weights(args.weights, shapes,
                                  source_classes=args.source_classes)
    np.save(args.out, values, allow_pickle=True)
    print(f"saved {len(values)} tensors to {args.out} "
          f"(feed to train --tf1-weights for the stage-1 restore)")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="dis_yolo_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("preprocess", help="build the GT cache for a split")
    _add_common(p)
    p.add_argument("--phase", default="train", choices=["train", "val", "test"])
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("synth", help="generate a synthetic demo dataset")
    _add_common(p)
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--size", type=int, default=320)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("train", help="train DIS-YOLO")
    _add_common(p)
    p.add_argument("--stage", type=int, default=1, choices=[1, 2],
                   help="1: heads only (backbone locked); 2: all layers")
    p.add_argument("--max-iter", type=int, default=10000)
    p.add_argument("--save-iter", type=int, default=500)
    p.add_argument("--summary-iter", type=int, default=50)
    p.add_argument("--restore", default=None,
                   help="Orbax checkpoint to resume ('auto' = latest)")
    p.add_argument("--weights-from", default=None,
                   help="load params/BN-stats only (stage-1 -> stage-2 bridge)")
    p.add_argument("--tf1-weights", default=None,
                   help="converted TF1 weights (.npy) for stage-1 restore")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batch over all local devices")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="K>1 scans K train steps per device dispatch "
                        "(amortizes the host-link RTT on network-attached "
                        "chips; snapped down to a divisor of save-iter)")
    p.add_argument("--device-corpus", action="store_true",
                   help="upload the decoded dataset to device memory once "
                        "and assemble batches on device; the host ships "
                        "only ~1 KB/step of indices + placement decisions "
                        "(implies device-side augs)")
    p.add_argument("--no-validation", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="mask mAP@0.5 + mIoU on a split")
    _add_common(p)
    p.add_argument("--phase", default="test", choices=["val", "test"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the eval batch over all local devices")
    p.add_argument("--quant", action="store_true",
                   help="serve the int8 post-training-quantized graph "
                        "(calibrated on train-split images)")
    p.add_argument("--quant-calib", default="pct", choices=["max", "pct"],
                   help="activation-scale statistic: absmax or the "
                        "cfg.quant_calib_pct percentile (outlier-robust; "
                        "default — see BENCHMARKS calibration sensitivity)")
    p.add_argument("--quant-calib-images", type=int, default=8,
                   help="number of calibration images")
    p.add_argument("--device-paste", action="store_true",
                   help="paste masks to original resolution on device "
                        "(replaces the host crop/resize/paste stage)")
    p.add_argument("--device-score", action="store_true",
                   help="score entirely on device: det-vs-GT mask IoU "
                        "matrices + mIoU confusion totals (no per-pixel "
                        "fetch at all; bit-identical metrics)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("verify-gt", help="render GT verification overlays")
    _add_common(p)
    p.add_argument("--phase", default="train", choices=["train", "val", "test"])
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_verify_gt)

    p = sub.add_parser("infer", help="run inference + overlay on image(s)")
    _add_common(p)
    p.add_argument("--images", required=True, help="image file or directory")
    p.add_argument("--out", default="infer_out")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--threshold", type=float, default=0.25)
    p.add_argument("--quant", action="store_true",
                   help="serve the int8 graph (activation scales "
                        "calibrated on the first input images)")
    p.add_argument("--quant-calib", default="pct", choices=["max", "pct"])
    p.add_argument("--artifact", default=None,
                   help="serve from an exported StableHLO artifact "
                        "(see the `export` subcommand); ignores "
                        "--checkpoint/--quant")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("export", help="serialize the serving graph to a "
                                      "self-contained StableHLO artifact")
    _add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", required=True,
                   help="artifact path prefix (writes .stablehlo + .json)")
    p.add_argument("--threshold", type=float, default=0.25)
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu' or 'tpu,cpu' "
                        "(default: current backend)")
    p.add_argument("--quant", action="store_true",
                   help="export the int8 graph (calibrated on the train "
                        "split)")
    p.add_argument("--quant-calib", default="pct", choices=["max", "pct"])
    p.add_argument("--quant-calib-images", type=int, default=8)
    p.add_argument("--symbolic-batch", nargs="?", const="b", default=None,
                   metavar="DIM",
                   help="export a shape-polymorphic artifact whose batch "
                        "dim is symbolic (serves any batch size); optional "
                        "dim name, default 'b'")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("convert-tf1", help="TF1 .ckpt -> .npy weight dict")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_convert_tf1)

    p = sub.add_parser(
        "convert-darknet",
        help="darknet yolov3.weights -> .npy weight dict (TF1 names); "
             "the reference README's custom-dataset step 2, natively")
    p.add_argument("--weights", required=True, help="path to .weights binary")
    p.add_argument("--out", required=True)
    p.add_argument("--num-class", type=int, default=3,
                   help="this model's class count (default 3)")
    p.add_argument("--source-classes", type=int, default=80,
                   help="class count the .weights was trained for "
                        "(80 for the stock COCO yolov3.weights); detection "
                        "convs are cropped per anchor when they differ")
    p.set_defaults(fn=cmd_convert_darknet)

    args = parser.parse_args(argv)
    from dis_yolo_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
