"""Training orchestration: the reference `Trainer(DefaultTrainer)` rebuilt.

Replaces d2's engine loop (`tools/train_net.py:23-69`) with an explicit
host loop around the single jitted train step: data loading (DetectionLoader
over registered datasets), periodic checkpointing (orbax, every
`solver.checkpoint_period`), periodic evaluation (`test.eval_period`) via
the dataset's registered evaluator type, loss logging, and optional
data-parallel sharding over a device mesh.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..config import Config, auto_scale_workers
from ..data.catalog import get_dataset_dicts, get_metadata
from ..data.mapper import DetectionLoader, PlaneRCNNMapper, PrefetchLoader
from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import (latest_checkpoint, load_checkpoint, load_weights,
                         load_torch_state_dict, port_detectron2_state_dict,
                         save_checkpoint)
from .optimizer import build_optimizer
from .train_step import (TrainState, create_train_state, make_multi_step,
                         make_train_step, make_sharded_train_step,
                         stack_batches)

logger = logging.getLogger(__name__)


def build_evaluator(dataset_name: str, cfg: Config, output_dir: str):
    """Evaluator dispatch by registered evaluator type (reference
    `Trainer.build_evaluator`, `tools/train_net.py:25-33`)."""
    etype = get_metadata(dataset_name).evaluator_type
    if etype == "arti":
        from ..evaluation import ArtiEvaluator
        return ArtiEvaluator(dataset_name, cfg, distributed=False,
                             output_dir=output_dir)
    if etype == "mp3d":
        from ..evaluation import ScannetEvaluator
        return ScannetEvaluator(dataset_name, cfg, distributed=False,
                                output_dir=output_dir)
    raise NotImplementedError(etype)


class Trainer:
    """Host-side training driver around the jitted step."""

    def __init__(self, cfg: Config, use_mesh: bool = True,
                 max_instances: int = 20):
        self.mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
        # linear-scaling rule (d2 auto_scale_workers): one "worker" = one
        # mesh device; the recipe's schedule is rewritten before anything
        # reads it
        n_workers = self.mesh.size if self.mesh is not None else 1
        cfg = auto_scale_workers(cfg, n_workers)
        self.cfg = cfg
        rng = jax.random.PRNGKey(cfg.seed)
        self.model, self.state = create_train_state(cfg, rng)
        self.tx = build_optimizer(cfg, self.state.params)
        if self.mesh is not None:
            # one fused gradient psum per step (DDP-equivalent semantics)
            raw_step = make_sharded_train_step(cfg, self.model, self.tx,
                                               self.mesh)
            self.state = replicate(self.mesh, self.state)
        else:
            raw_step = make_train_step(cfg, self.model, self.tx)
        self._step_fn = jax.jit(raw_step, donate_argnums=(0,))
        # k-step fused dispatch (solver.steps_per_dispatch): one program
        # executes k steps via lax.scan and returns stacked metrics —
        # amortizes the per-dispatch output-handle cost on high-latency
        # clients (PROFILE.md, ~1.4 s/step over the dev tunnel).  The
        # single-step fn above remains for the tail chunk when the
        # remaining iteration count is not a multiple of k.
        self.k = max(1, cfg.solver.steps_per_dispatch)
        self._multi_fn = (jax.jit(make_multi_step(raw_step, self.k),
                                  donate_argnums=(0,))
                          if self.k > 1 else None)

        records: List[dict] = []
        for name in cfg.datasets_train:
            records.extend(get_dataset_dicts(name))
        mapper = PlaneRCNNMapper(cfg, is_train=True,
                                 max_instances=max_instances)
        per_step = cfg.solver.ims_per_batch
        # background-thread prefetch overlaps cv2/mapper work with the
        # device step (reference: 4 dataloader workers, config.yaml:5)
        self.loader = PrefetchLoader(
            DetectionLoader(records, mapper, per_step, shuffle=True,
                            seed=cfg.seed))
        self._base_key = jax.random.PRNGKey(cfg.seed + 1)

    # -- checkpointing ------------------------------------------------------
    def resume_or_load(self, resume: bool = False) -> None:
        w = self.cfg.weights
        if resume:
            path = latest_checkpoint(self.cfg.output_dir)
            if path:
                self.state = load_checkpoint(path, self.state)
                logger.info("resumed from %s", path)
                return
        if w and (w.endswith(".pth") or w.endswith(".pkl")):
            params, batch_stats, stats = port_detectron2_state_dict(
                load_torch_state_dict(w), self.state.params,
                self.state.batch_stats)
            self.state = self.state._replace(params=params,
                                             batch_stats=batch_stats)
            logger.info("ported %s: %s", w, stats)
        elif w:
            # orbax dir (or a dir of step_* checkpoints): weights-only,
            # shape-tolerant warm start — the cross-stage recipe path
            # (stage 2/3 warm-start from a stage-1 checkpoint whose tree
            # lacks the new heads and whose opt state has different masks)
            path = latest_checkpoint(w) or w
            params, batch_stats, stats = load_weights(path, self.state)
            self.state = self.state._replace(params=params,
                                             batch_stats=batch_stats)
            logger.info(
                "warm-started from %s: %d loaded, %d fresh, %d dropped, "
                "%d shape-mismatched", path, stats["loaded"],
                len(stats["missing"]), len(stats["unexpected"]),
                len(stats["shape_mismatch"]))

    # -- the loop -----------------------------------------------------------
    def train(self, max_iter: Optional[int] = None,
              profile_dir: Optional[str] = None) -> TrainState:
        """Host loop.  `profile_dir` (or $ARTI3D_PROFILE_DIR) captures a jax
        profiler trace of steps 10-15 — the reference has no tracing at all
        (SURVEY.md §5); this is the TPU-native observability hook."""
        import json as _json

        cfg = self.cfg
        max_iter = max_iter if max_iter is not None else cfg.solver.max_iter
        start = int(np.asarray(self.state.step))
        it = iter(self.loader)
        t0 = time.time()
        profile_dir = profile_dir or os.environ.get("ARTI3D_PROFILE_DIR")
        metrics_path = os.path.join(cfg.output_dir, "metrics.json")
        os.makedirs(cfg.output_dir, exist_ok=True)

        def log_step(step: int, metrics_host: Dict[str, float]) -> None:
            losses = dict(metrics_host)
            dt = time.time() - t0
            s_per_it = dt / max(step + 1 - start, 1)
            logger.info("iter %d: total=%.4f (%.2f s/it) %s", step + 1,
                        losses.pop("total_loss"), s_per_it,
                        {k: round(v, 4) for k, v in losses.items()})
            # d2-style metrics.json: one JSON line per log event
            with open(metrics_path, "a") as f:
                f.write(_json.dumps({
                    "iteration": step + 1,
                    "s_per_it": round(s_per_it, 4),
                    **{k: round(float(v), 6) for k, v in metrics_host.items()},
                }) + "\n")

        def crossed(period: int, lo: int, hi: int) -> bool:
            """Did any step count in (lo, hi] hit a multiple of `period`?
            With k-step dispatch the action fires at the chunk boundary
            (count hi), so the checkpoint's label always matches the state
            it contains."""
            return period > 0 and (hi // period) > (lo // period)

        def periodic(lo: int, hi: int) -> None:
            if crossed(cfg.solver.checkpoint_period, lo, hi):
                save_checkpoint(cfg.output_dir, self.state, hi)
            if crossed(cfg.test.vis_period, lo, hi):
                self._maybe_vis(hi)
            if crossed(cfg.test.eval_period, lo, hi):
                try:
                    results = self.test()
                    # d2-style: eval metric dicts land in metrics.json too
                    with open(metrics_path, "a") as f:
                        for name, res in results.items():
                            f.write(_json.dumps({
                                "iteration": hi, "eval_dataset": name,
                                **{k: float(v) for k, v in res.items()},
                            }) + "\n")
                except Exception as e:  # eval must not kill training
                    logger.warning("eval failed: %s", e)

        # -- async device feeder: a daemon thread assembles each dispatch
        # chunk (k mapper batches, stacked) and STARTS its host->device
        # transfer (`jax.device_put` is async) while the device is still
        # executing the previous chunk.  On high-latency clients the
        # payload transfer (~295 MB per k=20 chunk at ims 16) otherwise
        # serializes with compute — measured as the residual between the
        # soak wall and the no-loader k-step wall (PROFILE.md).  maxsize=1
        # bounds device residency to 2 chunks (one executing, one landing).
        import queue as _queue
        import threading as _threading

        def chunk_sizes(lo: int, hi: int):
            while lo < hi:
                c = (self.k if (self._multi_fn is not None
                                and lo + self.k <= hi) else 1)
                yield c
                lo += c

        feed_q: "_queue.Queue" = _queue.Queue(maxsize=1)
        _sentinel = object()

        def _feeder():
            try:
                for c in chunk_sizes(start, max_iter):
                    raw = [next(it) for _ in range(c)]
                    raw = [{kk: v for kk, v in b.items()
                            if isinstance(v, np.ndarray)} for b in raw]
                    if c > 1:
                        batch = stack_batches(raw)
                        batch = (shard_batch(self.mesh, batch, axis=1)
                                 if self.mesh is not None
                                 else jax.device_put(batch))
                    else:
                        batch = (shard_batch(self.mesh, raw[0])
                                 if self.mesh is not None
                                 else jax.device_put(raw[0]))
                    feed_q.put((c, batch))
            except BaseException as e:  # surfaced on the consumer side
                feed_q.put(e)
            finally:
                feed_q.put(_sentinel)

        _threading.Thread(target=_feeder, daemon=True).start()

        step = start
        while step < max_iter:
            item = feed_q.get()
            if item is _sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            k, batch = item
            if profile_dir and step >= start + 10:
                jax.profiler.start_trace(profile_dir)
            if k > 1:
                self.state, metrics = self._multi_fn(self.state, batch,
                                                     self._base_key)
                # stacked (k,) metric leaves: one host fetch for the chunk
                mhost = jax.device_get(metrics)
                per_step = [{kk: float(v[i]) for kk, v in mhost.items()}
                            for i in range(k)]
            else:
                self.state, metrics = self._step_fn(self.state, batch,
                                                    self._base_key)
                per_step = [{kk: float(v) for kk, v in
                             jax.device_get(metrics).items()}]
            if profile_dir and step >= start + 10:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", profile_dir)
                profile_dir = None
            for i in range(k):
                s = step + i
                if (s + 1) % 20 == 0 or s == start:
                    log_step(s, per_step[i])
            # checkpoint/eval/vis fire at dispatch boundaries: with k > 1
            # the cadence snaps to multiples of k (see SolverConfig)
            periodic(step, step + k)
            step += k
        return self.state

    def _maybe_vis(self, iteration: int) -> None:
        """Training-iteration visualization hook (reference VIS_PERIOD /
        MODEL.VIS_MINIBATCH, wired in the host trainer instead of inside
        the jitted model: `modeling/meta_arch/planercnn.py:41`,
        `modeling/roi_heads/roi_heads.py:30-33`, `config/config.yaml:367`).
        Cadence is gated by the caller (`periodic`)."""
        try:
            from .vis_hook import save_train_vis
            out = save_train_vis(self, iteration)
            logger.info("training vis written to %s", out)
        except Exception as e:  # vis must not kill training
            logger.warning("training vis failed: %s", e)

    # -- evaluation ---------------------------------------------------------
    def test(self) -> Dict[str, Dict[str, float]]:
        """Per-test-dataset inference + evaluator run (reference
        `Trainer.test`, `tools/train_net.py:47-69`)."""
        from ..video.pipeline import VideoPipeline
        from ..utils.rle import rle_encode

        results = {}
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        # conf_threshold=0.0 mirrors the reference: Trainer.test feeds EVERY
        # survivor of the detector's own score_thresh_test (0.05 in all three
        # recipe configs) to the evaluator — the evaluators sweep score
        # thresholds themselves.  With random/early weights this can mean up
        # to detections_per_image entries per image on the host-side
        # evaluator; periodic in-training eval at scale should set
        # `test.eval_period=0` (the recipes do) and evaluate offline.
        pipeline = VideoPipeline(self.cfg, self.model, variables,
                                 batch_size=max(self.cfg.solver.ims_per_batch, 1),
                                 conf_threshold=0.0)
        for name in self.cfg.datasets_test:
            evaluator = build_evaluator(name, self.cfg, self.cfg.output_dir)
            evaluator.reset()
            records = get_dataset_dicts(name)
            mapper = PlaneRCNNMapper(self.cfg, is_train=False)
            # REAL batches through the pipeline: one padded single-frame call
            # per record would waste (batch-1)/batch of the compute
            samples = [mapper(rec) for rec in records]
            preds = pipeline.run(
                [s["images"].astype(np.uint8) for s in samples])
            for rec, sample, p, depth in zip(records, samples, preds,
                                             pipeline.depths):
                instances = []
                for i in range(len(p)):
                    box = p.boxes[i]
                    instances.append({
                        "image_id": rec["image_id"],
                        "category_id": int(p.classes[i]),
                        "bbox": [float(box[0]), float(box[1]),
                                 float(box[2] - box[0]), float(box[3] - box[1])],
                        "score": float(p.scores[i]),
                        "segmentation": rle_encode(
                            p.masks[i].astype(np.uint8)),
                    })
                out = {
                    "instances": instances,
                    "pred_rot_axis": p.rot_axis,
                    "pred_tran_axis": p.tran_axis,
                    "pred_plane": p.planes,
                    "depth": depth,
                }
                evaluator.process(
                    [{"image_id": rec["image_id"],
                      "file_name": rec["file_name"],
                      "depth": sample.get("gt_depth")}], [out])
            results[name] = evaluator.evaluate()
            logger.info("eval %s: %s", name, results[name])
        return results
