"""Training driver: the reference ``Solver`` (train_yolo3_mask.py:20-235)
rebuilt around a jitted train step.

Loop structure parity:
  * piecewise LR handled inside the optimizer schedule
  * metric log every ``summary_iter`` steps (:153-212)
  * every ``save_iter`` steps: full validation mAP sweep over the val split
    + Orbax checkpoint + val-history .npy (:156-227)
  * config snapshot written once (:229-235)

TPU-minded differences: data prefetch thread overlaps host augmentation
with device compute; the validation sweep reuses one jitted predict over
fixed-size batches; optional DP mesh shards the batch across chips.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dis_yolo_tpu.config import DISYoloConfig
from dis_yolo_tpu.data.dataset import DefectTrainData
from dis_yolo_tpu.data.val_data import DefectValData
from dis_yolo_tpu.eval.map_eval import Evaluator
from dis_yolo_tpu.models import api
from dis_yolo_tpu.train import checkpoint as ckpt
from dis_yolo_tpu.train import train_step as ts
from dis_yolo_tpu.utils.metrics_log import MetricLogger
from dis_yolo_tpu.utils.timer import Timer


class Solver:
    def __init__(self, cfg: DISYoloConfig,
                 data: Optional[DefectTrainData] = None,
                 evaluator: Optional[Evaluator] = None,
                 val_data: Optional[DefectValData] = None,
                 mesh=None, seed: int = 0,
                 restore: Optional[str] = None,
                 weights_from: Optional[str] = None,
                 tf1_weights: Optional[str] = None):
        self.cfg = cfg
        self.mesh = mesh
        # with device-side augs the host loader must not also flip /
        # photometric (they'd apply twice)
        self.device_corpus = None
        if data is not None:
            self.data = data
        elif cfg.device_corpus:
            # decoded dataset uploads to HBM once; the loader ships only
            # indices + placement decisions (data/device_corpus.py)
            from dis_yolo_tpu.data.device_corpus import (CorpusTrainData,
                                                         upload_corpus)
            self.data = CorpusTrainData(cfg, "train", seed=seed)
            sharding = None
            if mesh is not None:
                # read-only dataset: replicate across the mesh; each
                # device assembles only its batch shard (GSPMD constraint
                # in make_jitted_corpus_multi_step)
                from dis_yolo_tpu.parallel.sharding import replicated
                sharding = replicated(mesh)
            self.device_corpus = upload_corpus(self.data.corpus,
                                               sharding=sharding)
        elif cfg.loader_workers:
            from dis_yolo_tpu.data.dataset import ParallelTrainData
            workers = (None if cfg.loader_workers < 0 else cfg.loader_workers)
            self.data = ParallelTrainData(cfg, "train", seed=seed,
                                          host_augs=not cfg.device_side_augs,
                                          workers=workers)
        else:
            self.data = DefectTrainData(cfg, "train", seed=seed,
                                        host_augs=not cfg.device_side_augs)
        self.evaluator = evaluator
        self.val_data = val_data
        self.ckpt_dir = os.path.join(cfg.output_dir, "checkpoint")
        self.loss_dir = os.path.join(cfg.output_dir, "lossnp")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.loss_dir, exist_ok=True)
        if ckpt.is_primary():   # one writer per shared artifact dir
            with open(os.path.join(self.ckpt_dir, "config.txt"), "w") as f:
                f.write(cfg.snapshot())
        self.logger = MetricLogger(self.ckpt_dir)

        self.model = api.create_model(cfg)
        variables = api.init_variables(cfg, jax.random.PRNGKey(seed))

        if tf1_weights:  # stage-1 selective restore from converted TF1 ckpt
            values = (np.load(tf1_weights, allow_pickle=True).item()
                      if tf1_weights.endswith(".npz.npy") or
                      tf1_weights.endswith(".npy")
                      else ckpt.convert_tf1_checkpoint(tf1_weights))
            variables = ckpt.stage1_restore(variables, values)

        self.tx = ts.make_optimizer(variables["params"], cfg)
        self.state = ts.TrainState(variables["params"], variables["batch_stats"],
                                   self.tx.init(variables["params"]),
                                   jnp.asarray(0))
        if weights_from:
            # stage transition (e.g. stage-1 ckpt -> stage-2 run): load
            # params + BN stats only; optimizer state and step start fresh
            # because the trainable mask differs between stages
            # (train_yolo3_mask.py:109-114 stage-2 restore + step reset).
            p, bs = ckpt.restore_weights(weights_from, self.state.params,
                                         self.state.batch_stats)
            self.state = ts.TrainState(p, bs, self.tx.init(p), jnp.asarray(0))
        if restore == "auto":  # crash recovery: newest checkpoint if any
            restore = ckpt.latest_checkpoint(self.ckpt_dir)
            if restore:
                print(f"Auto-resuming from {restore}")
        if restore:  # resume from an Orbax checkpoint (global_step kept)
            self.state = ckpt.restore_checkpoint(restore, self.state)

        # donate=True: the train loop is `state = step(state, ...)`, so the
        # previous state's buffers are dead — in-place update halves the
        # params+Adam-moments HBM footprint
        self.step_fn = ts.make_jitted_train_step(self.model, self.tx, mesh=mesh,
                                                 dp_axis=cfg.dp_axis,
                                                 donate=True)
        # validation reuses the DP mesh: batches shard over chips, outputs
        # come back replicated for the host-side scorer
        self.predict_fn = api.make_jitted_predict(self.model, mesh=mesh,
                                                  dp_axis=cfg.dp_axis)
        self._paste_cache: Dict = {}   # per-size pasted programs, compile once
        self.rng = jax.random.PRNGKey(seed + 1)
        # best-validation tracking (automates the reference's keep-all +
        # val_map manual peak selection, train_yolo3_mask.py:58,221-227);
        # survives restore="auto" resumes via best.json
        best = ckpt.read_best(self.ckpt_dir)
        self.best_step = best["step"] if best else None
        self.best_map = best["mAP"] if best else -1.0

    # ------------------------------------------------------------------
    def validate(self, device_paste: Optional[bool] = None,
                 device_score: Optional[bool] = None) -> Optional[Dict]:
        """Validation sweep via the shared driver (eval/sweep.py).

        ``device_score`` (default: on for TPU backends) computes the
        det-vs-GT mask IoU matrix ON DEVICE and fetches only [D,6] boxes +
        [D,G] floats per image — the GT masks upload once and stay device-
        resident across sweeps, so a periodic val sweep on a network-
        attached chip pays ~2.5 KB/img of wire instead of ~1.35 MB/img of
        packed masks (bit-identical mAP; BENCHMARKS "Validation sweep").
        ``device_paste`` is the fallback mask-fetching route.
        """
        if self.evaluator is None or self.val_data is None:
            return None
        from dis_yolo_tpu.eval.sweep import run_split
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if device_score is None:
            device_score = on_tpu and device_paste is None
        if device_paste is None:
            device_paste = on_tpu and not device_score
        # read the split from disk once per process: DefectValData.get()
        # re-decodes every image per call, and the periodic sweep would
        # otherwise pay that every save_iter (the stable host identity also
        # keys the device-resident image cache inside run_split)
        if not hasattr(self, "_val_arrays"):
            self._val_arrays = self.val_data.get()
        images, names, windows = self._val_arrays
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        detdata, t_pred = run_split(
            self.cfg, self.model, variables, images, names, windows,
            device_paste=device_paste, gt_sizes=self.evaluator.gt_sizes,
            mesh=self.mesh,
            predict_fn=None if (device_paste or device_score)
            else self.predict_fn,
            paste_cache=self._paste_cache,
            want_semantic=False,   # mAP only — skip the mIoU semantic map
            device_score=device_score, gt_records=self.evaluator.gt_masks)
        result = self.evaluator.evaluate_detections(detdata)
        result["t_device_s"] = t_pred
        return result

    # ------------------------------------------------------------------
    def _at_save(self, step: int, start: int, max_iter: int,
                 record_loss: float, load_timer: Timer, train_timer: Timer):
        """validate + checkpoint + val-history cadence (shared by the
        per-step and the K-steps-per-dispatch loops)."""
        cfg = self.cfg
        result = self.validate()
        if result is not None:
            if result["mAP"] >= self.best_map:
                self.best_map, self.best_step = result["mAP"], step
                ckpt.mark_best(self.ckpt_dir, step, result["mAP"])
            if ckpt.is_primary():
                self.logger.log_validation(step, self.data.epoch,
                                           record_loss, result)
                # epoch log line incl. ETA (train_yolo3_mask.py:185-202)
                done = step - start + 1
                print(f"Step {step} epoch {self.data.epoch} "
                      f"loss {record_loss:.3f} "
                      f"AP {['%.3f' % a for a in result['AP']]} "
                      f"mAP50 {result['mAP']:.3f} "
                      f"best {self.best_map:.3f}@{self.best_step} "
                      f"speed {train_timer.total_time / done:.3f}s/it "
                      f"load {load_timer.total_time / done:.3f}s/it "
                      f"remain {train_timer.remain(done, max_iter - start + 1)}")
        # snapshot-then-background-save: the 396 MB device->host state
        # copy (13-30 s on the tunnel) overlaps the next train blocks
        # instead of stalling the loop (single-process; multi-host falls
        # back to the coordinated synchronous save inside)
        ckpt.save_checkpoint_background(self.ckpt_dir, self.state, step)
        # protect the step just saved too: its async write may still be in
        # flight, and stale higher-numbered dirs (e.g. an output_dir reused
        # across runs) would otherwise age it out mid-write
        ckpt.prune_checkpoints(
            self.ckpt_dir, cfg.max_keep_ckpt,
            protect=(step,) + ((self.best_step,) if self.best_step else ()))
        if ckpt.is_primary():
            self.logger.save_val_history(self.loss_dir, step)

    # ------------------------------------------------------------------
    def train(self, max_iter: Optional[int] = None):
        from dis_yolo_tpu.utils.runtime import device_prefetch
        cfg = self.cfg
        max_iter = max_iter or cfg.max_iter
        load_timer, train_timer = Timer(), Timer()
        self.data.start_prefetch()
        epoch_loss, epoch_count = 0.0, 0

        start = int(self.state.step) + 1
        if start > max_iter:
            return self.state
        if cfg.steps_per_dispatch > 1 or self.device_corpus is not None:
            # the corpus path always runs blocked (K=1 degenerates fine):
            # its assemble-on-device step only exists in the block program
            state = self._train_blocks(start, max_iter, load_timer,
                                       train_timer)
            self.data.stop()
            ckpt.wait_for_checkpoints()
            return state
        # host loader thread -> async device transfers two batches ahead
        # so upload overlaps the previous step's compute
        sharding = None
        if self.mesh is not None:
            from dis_yolo_tpu.parallel.sharding import batch_sharding
            sharding = batch_sharding(self.mesh, cfg.dp_axis)
        batches = device_prefetch(
            (self.data.next_prefetched() for _ in range(start, max_iter + 1)),
            size=2, sharding=sharding)
        dump_hlo = bool(os.environ.get("DIS_YOLO_DUMP_HLO"))
        for step in range(start, max_iter + 1):
            load_timer.tic()
            batch = next(batches)
            load_timer.toc()

            if dump_hlo:  # tf.summary graph-dump analog (train_yolo3_mask.py:115)
                dump_hlo = False
                try:
                    text = self.step_fn.lower(self.state, batch,
                                              jax.random.PRNGKey(0)).as_text()
                    with open(os.path.join(self.ckpt_dir,
                                           "train_step.stablehlo.txt"), "w") as f:
                        f.write(text)
                except Exception as e:
                    print(f"HLO dump failed: {e}")

            train_timer.tic()
            self.rng, key = jax.random.split(self.rng)
            self.state, metrics = self.step_fn(self.state, batch, key)
            train_timer.toc()
            # keep the loss on device between syncs: a float() here would
            # force a host round-trip every step
            epoch_loss = epoch_loss + metrics["total_loss"]
            epoch_count += 1

            if step % cfg.summary_iter == 0 and ckpt.is_primary():
                row = {k: float(v) for k, v in metrics.items()}
                # skipped non-finite-grad steps (optax.apply_if_finite state)
                if hasattr(self.state.opt_state, "total_notfinite"):
                    row["skipped_nonfinite"] = int(
                        self.state.opt_state.total_notfinite)
                self.logger.log(step, row)

            if step % cfg.save_iter == 0:
                self._at_save(step, start, max_iter,
                              float(epoch_loss) / max(epoch_count, 1),
                              load_timer, train_timer)
                epoch_loss, epoch_count = 0.0, 0

        self.data.stop()
        ckpt.wait_for_checkpoints()  # drain the async save before returning
        return self.state

    # ------------------------------------------------------------------
    def _train_blocks(self, start: int, max_iter: int,
                      load_timer: Timer, train_timer: Timer):
        """Dispatch-amortized loop: K train steps per host->device dispatch.

        One compiled ``lax.scan`` block advances K steps over K stacked
        device-prefetched batches (train_step.make_jitted_multi_step), so
        the per-step host cost collapses from (dispatch RTT + host-side
        RNG split + transfer handshake) to 1/K of one block dispatch —
        the fix for the 216-258 ms/step wall vs 10.65 ms device step of
        the round-4 reference-schedule run.  Seed-for-seed identical
        trajectory to the per-step loop
        (tests/test_train_step.py::test_multi_step_matches_single).

        K = ``cfg.steps_per_dispatch``, snapped down to a divisor of
        ``save_iter`` so no block straddles a validation/checkpoint
        boundary; the tail to ``max_iter`` (if shorter) compiles one
        extra, shorter block shape.
        """
        from dis_yolo_tpu.train import train_step as ts
        from dis_yolo_tpu.utils.runtime import device_prefetch
        cfg = self.cfg
        K = max(1, cfg.steps_per_dispatch)
        while cfg.save_iter % K:
            K -= 1
        if K != cfg.steps_per_dispatch and ckpt.is_primary():
            print(f"steps_per_dispatch {cfg.steps_per_dispatch} -> {K} "
                  f"(snapped to a divisor of save_iter {cfg.save_iter})")

        sharding = None
        if self.mesh is not None:
            from dis_yolo_tpu.parallel.sharding import stacked_batch_sharding
            sharding = stacked_batch_sharding(self.mesh, cfg.dp_axis)

        def blocks():
            todo = max_iter - start + 1
            while todo > 0:
                m = min(K, todo)
                bats = [self.data.next_prefetched() for _ in range(m)]
                todo -= m
                yield {k: np.stack([b[k] for b in bats]) for k in bats[0]}

        batches = device_prefetch(blocks(), size=2, sharding=sharding)
        if self.device_corpus is not None:
            corpus_fn = ts.make_jitted_corpus_multi_step(
                self.model, self.tx, mesh=self.mesh, dp_axis=cfg.dp_axis,
                donate=True)

            def multi_fn(state, block, rng):
                return corpus_fn(state, self.device_corpus, block, rng)
        else:
            multi_fn = ts.make_jitted_multi_step(self.model, self.tx,
                                                 mesh=self.mesh,
                                                 dp_axis=cfg.dp_axis,
                                                 donate=True)
        epoch_loss, epoch_count = 0.0, 0
        step = start - 1
        while step < max_iter:
            load_timer.tic()
            block = next(batches)
            load_timer.toc()
            train_timer.tic()
            self.state, self.rng, metrics = multi_fn(self.state, block,
                                                     self.rng)
            train_timer.toc()
            m = int(metrics["total_loss"].shape[0])
            first, step = step + 1, step + m
            # stacked [m] metrics stay on device; one sum per block
            epoch_loss = epoch_loss + metrics["total_loss"].sum()
            epoch_count += m

            log_steps = [s for s in range(first, step + 1)
                         if s % cfg.summary_iter == 0]
            if log_steps and ckpt.is_primary():
                rows = {k: np.asarray(v) for k, v in metrics.items()}
                skipped = (int(self.state.opt_state.total_notfinite)
                           if hasattr(self.state.opt_state,
                                      "total_notfinite") else None)
                for s in log_steps:
                    row = {k: float(v[s - first]) for k, v in rows.items()}
                    if skipped is not None:
                        # block-tail cumulative count (per-step resolution
                        # would need K host syncs — the thing K removes)
                        row["skipped_nonfinite"] = skipped
                    self.logger.log(s, row)

            if step % cfg.save_iter == 0:
                self._at_save(step, start, max_iter,
                              float(epoch_loss) / max(epoch_count, 1),
                              load_timer, train_timer)
                epoch_loss, epoch_count = 0.0, 0
        return self.state
