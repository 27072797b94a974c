"""Typed configuration for the DIS-YOLO TPU framework.

Replaces the reference's flat mutable module of UPPERCASE constants
(``/root/reference/yolo/config.py:12-72``) with a frozen dataclass that is
hashable (so it can be closed over by ``jax.jit``) and explicit about every
knob the reference exposes: classes, the 9 k-means anchors clustered at
576 px, loss scales, thresholds and the fixed-shape caps that make the whole
pipeline XLA-friendly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class DISYoloConfig:
    """All hyper-parameters of the DIS-YOLO instance-segmentation framework.

    Defaults reproduce the reference configuration
    (``/root/reference/yolo/config.py``).
    """

    # ---- dataset / paths (host side only; never captured in jitted code) ----
    model_path: str = "."
    dataset: str = "data"
    output_dir: str = "output"
    weights_file: str = ""

    # ---- classes & anchors -------------------------------------------------
    classes: Tuple[str, ...] = ("crack", "spall", "rebar")
    # 9 anchors (w, h) from k-means at image size 576 (config.py:22), flat
    # tuple so the dataclass stays hashable; use `anchors_array` for math.
    anchors: Tuple[Tuple[float, float], ...] = (
        (31, 23), (62, 58), (143, 91), (213, 186), (61, 337),
        (194, 432), (474, 248), (551, 93), (478, 454),
    )
    anchors_per_scale: int = 3

    # ---- augmentation toggles (train_data.py) ------------------------------
    flipped: bool = True
    blur_noise_light: bool = True

    # ---- training schedule --------------------------------------------------
    max_iter: int = 10000
    summary_iter: int = 50
    save_iter: int = 500
    # piecewise LR of the reference stage-2 run (train_yolo3_mask.py:127-141):
    # lr_values[i] applies while step <= lr_boundaries[i]; override both to
    # scale the schedule to shorter runs
    lr_boundaries: tuple = (10000, 20000, 25000)
    lr_values: tuple = (1e-3, 1e-4, 1e-5, 1e-6)

    # ---- model ---------------------------------------------------------------
    alpha: float = 0.1              # leaky-ReLU slope (config.py:38)
    batch_size: int = 2
    image_size: int = 576
    k_map: int = 3                  # k x k position-sensitive score maps
    mask_stride: int = 2            # score maps at input/2 (yolo3_net_pos.py:380)

    # ---- loss scales (config.py:49-54) --------------------------------------
    object_scale: float = 2.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    coord_scale: float = 1.0
    mask_scale: float = 5.0
    # defined but never consumed by the reference either (config.py:54 has
    # no reader anywhere in the repo); kept for config-surface parity
    score_scale: float = 2.0
    l2_scale: float = 1e-4          # tf.contrib l2_regularizer scale
    ignore_thresh: float = 0.5      # iou above which no-obj conf loss ignored

    # ---- detection thresholds -----------------------------------------------
    obj_threshold: float = 0.25
    iou_threshold: float = 0.3      # NMS IoU
    test_size: int = 576

    # ---- fixed-shape caps (config.py:69-72) ----------------------------------
    max_box_per_image: int = 20
    max_detection: int = 30
    # TPU-only knob: number of score-sorted candidates entering the O(K^2)
    # greedy NMS.  The reference NMS-es every box above obj_threshold; with
    # max_detection=30 a 512-candidate shortlist is lossless in practice.
    pre_nms_top_k: int = 512

    # ---- precision / parallelism --------------------------------------------
    compute_dtype: str = "bfloat16"   # conv compute dtype on TPU
    param_dtype: str = "float32"
    # Fuse mask assembly + sigmoid into a Pallas kernel on TPU backends
    # (inference path only; training keeps the differentiable jnp form).
    use_pallas_assembly: bool = True
    # Deploy mode: ConvBN blocks become fused conv+bias+leaky (BN folded
    # into the kernel, no f32 casts); use models.fold.deploy_variables to
    # convert trained weights.
    deploy: bool = False
    # int8 post-training-quantized serving graph (models/quant.py): conv_bn
    # layers run as s8xs8->s32 convs on the MXU's double-rate path with a
    # f32 dequant epilogue.  Weights via models.quant.quantize_deploy
    # (per-out-channel weight scales + per-tensor calibrated activation
    # scales); quant_calibrate=True builds the float calibration graph that
    # records per-layer input ranges.
    quant: bool = False
    quant_calibrate: bool = False
    # Layers (reference 1-based ids) that run int8 when quant=True.  The
    # default skips the high-resolution low-channel stem (conv1-4 at
    # 576^2/288^2): there the per-layer quantize/dequant elementwise cost
    # exceeds the MXU saving, while >=conv5 (>=128ch at <=144^2) the int8
    # double-rate path wins (scripts/bench_quant.py).
    quant_layers: Tuple[int, ...] = tuple(range(5, 86))
    # Percentile (of |activation|) recorded by the calibration graph as the
    # outlier-robust alternative to absmax scales; selected at
    # calibrate_deploy(use_pct=True) / `cli eval --quant-calib pct`.
    quant_calib_pct: float = 99.9
    # Space-to-depth stem (deploy only): input repacked to 2x2 blocks and
    # conv1/conv2 weight-transformed so the low-channel 576^2 stem runs as
    # dense 128-lane convs at 288^2 — mathematically exact (models/s2d.py).
    # Weights via models.s2d.s2d_stem_variables(deploy_variables(v)).
    s2d_stem: bool = False
    # Run flip + photometric augmentation on device inside the jitted train
    # step (data/device_augment.py); pair with
    # DefectTrainData(host_augs=False).
    device_side_augs: bool = False
    # Host-loader example-assembly processes (data/dataset.ParallelTrainData).
    # 0 = the single prefetch thread (the reference's synchronous loader
    # semantics, one RNG stream); N>0 = a fork pool of N workers with the
    # worker-count-invariant per-example RNG scheme; -1 = every host core.
    # The pool closes the wall-vs-device-step gap once the device step is
    # faster than ~60 ms/batch of GIL-bound cv2/numpy assembly.
    loader_workers: int = 0
    # Keep only the newest N checkpoints (0 = keep all, the reference's
    # max_to_keep=None).  A 576^2 TrainState is ~1 GB on disk (params +
    # Adam moments); the 40k-iter reference schedule saves 80 of them.
    max_keep_ckpt: int = 0
    # Per-layer rematerialization: each ConvBN's internals (conv output,
    # f32 normalized values, activation) are recomputed in the backward
    # pass instead of stored, keeping only layer inputs live — ~3x less
    # activation HBM, raising the max trainable batch at 576^2 at the cost
    # of re-running the (cheap, MXU-bound) forward convs during backprop.
    remat: bool = False
    # Gradient accumulation: the train step splits its batch into this many
    # microbatches and lax.scan's over them, averaging gradients/metrics —
    # only one microbatch's activations are ever live, so the *effective*
    # batch (cfg.batch_size) can exceed what fits in HBM at once.  Composes
    # with remat and the DP mesh step (per-device batch is what's split;
    # the gradient pmean still happens once, after accumulation).  BN
    # running stats update sequentially per microbatch (momentum applied
    # grad_accum times per step) — batch *moments* still see only a
    # microbatch, so pair large accumulation with sync-BN semantics in
    # mind (PARITY.md deviation list).
    grad_accum: int = 1
    # Training robustness (PARITY.md deviation list).  The reference (TF1,
    # f32, batch 2, LR 1e-3) inherits stability from its mature COCO
    # pretrained backbone; self-pretrained stand-ins are less conditioned
    # and a single bad batch can spike the loss into NaN (observed at
    # 576^2/b2: healthy to step ~4.5k, then one spike -> NaN forever).
    #   skip_nonfinite_updates: wrap the optimizer in
    #     optax.apply_if_finite — a step whose gradients contain NaN/inf is
    #     SKIPPED (params + Adam moments untouched) instead of poisoning
    #     the weights; finite steps are bit-identical to the unwrapped
    #     optimizer.  After 100 consecutive bad steps the guard passes
    #     NaNs through so a genuine divergence stays visible.
    #   grad_clip_norm: optax.clip_by_global_norm before Adam; 0 = off
    #     (reference parity — TF1 run does not clip).
    skip_nonfinite_updates: bool = True
    grad_clip_norm: float = 0.0
    # Steps per device dispatch: >1 makes Solver.train advance the model K
    # steps per host->device round trip (lax.scan of the train step over a
    # stacked batch block, train/train_step.make_jitted_multi_step).  On a
    # network-attached chip the per-step dispatch RTT dominated wall clock
    # (216-258 ms/step vs a 10.65 ms device step for the 576^2 reference
    # schedule); K amortizes it K-fold with a seed-identical trajectory.
    # Snapped down to a divisor of save_iter so blocks never straddle a
    # validation/checkpoint boundary.  1 = the reference's per-step loop.
    steps_per_dispatch: int = 1
    # Device-resident corpus: the decoded dataset (images + instance
    # masks) lives in HBM; the host ships only example indices + placement
    # decisions (~1 KB/step instead of ~4.7 MB).  Pixel assembly (resize/
    # place, label-grid scatter) runs inside the jitted step
    # (data/device_corpus.py).  Requires device_side_augs.
    device_corpus: bool = False
    # Commute the decoder's 1x1 fusion convs before their 2x nearest
    # upsample (exact algebra, same params; layers.CommutedConcatConvBN).
    # Off = the reference's literal resize->concat->conv graph order.
    decoder_commute: bool = False
    # Fused Pallas NMS kernel (suppression matrix VMEM-resident).  Exact
    # parity with the jnp path and ~10% faster; off by default because the
    # serial select-rounds dominate either way.
    use_pallas_nms: bool = False
    # Greedy-NMS evaluation strategy: "fixpoint" solves the keep set by a
    # while_loop of O(K^2) sweeps (converges in ~suppression-chain-depth
    # iterations, typically 2-4 — TPU latency-friendly); "scan" is the
    # max_detection-round serial select-and-suppress.  Both are exactly the
    # reference's greedy semantics (tests/test_nms.py).
    nms_engine: str = "fixpoint"
    # conv layer ids (1-based, matching reference scope names) that are
    # frozen.  Stage 1 = backbone 1..52 locked (yolo3_net_pos.py:155-156).
    locked_layers: Tuple[int, ...] = tuple(range(1, 53))
    dp_axis: str = "dp"
    # Cross-replica (sync) BatchNorm: mesh axis name the batch moments are
    # pmean'd over, or None for device-local statistics.  Set automatically
    # by the mesh train step so DP training computes the exact global-batch
    # statistics a single device would (the reference is single-GPU, so
    # sync-BN is what preserves its training semantics under DP).
    bn_axis: Optional[str] = None

    # -------------------------------------------------------------------------
    @property
    def num_class(self) -> int:
        return len(self.classes)

    @property
    def base_grid(self) -> int:
        # grid of the lowest-resolution (stride-32) head (config.py:46)
        return self.image_size // 32

    @property
    def mask_size(self) -> int:
        # score-map side length: stride-2 decoder output
        return self.image_size // self.mask_stride

    @property
    def num_scoremaps(self) -> int:
        return self.k_map * self.k_map

    @property
    def output_depth(self) -> int:
        return (self.num_class + 5) * self.anchors_per_scale

    def anchors_array(self) -> np.ndarray:
        return np.asarray(self.anchors, dtype=np.float32)

    def class_to_ind(self) -> dict:
        return {c: i for i, c in enumerate(self.classes)}

    def grid_sizes(self) -> Tuple[int, int, int]:
        """Grid side lengths ordered small-object scale first.

        Matches ``interpret_output``'s iteration order where index 0 is the
        stride-8 72x72 map (yolo3_net_pos.py:353: yolos=[yolov3_3, yolov3_2,
        yolov3_1]).
        """
        g = self.base_grid
        return (4 * g, 2 * g, g)

    def data_path(self, phase: str) -> str:
        return os.path.join(self.dataset, phase)

    def replace(self, **kw) -> "DISYoloConfig":
        return dataclasses.replace(self, **kw)

    def snapshot(self) -> str:
        """Human-readable config dump (parity with Solver.save_cfg)."""
        lines = []
        for f in dataclasses.fields(self):
            lines.append("{}: {}".format(f.name.upper(), getattr(self, f.name)))
        return "\n".join(lines) + "\n"


DEFAULT_CONFIG = DISYoloConfig()
