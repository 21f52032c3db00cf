"""The jitted training step: forward -> losses -> SGD update.

Replaces the reference's detectron2 `DefaultTrainer.run_step` (d2 engine loop
driving `PlaneRCNN.forward` loss dicts, `tools/train_net.py:23-69`) with one
pure function `(TrainState, batch, key) -> (TrainState, metrics)` that jits /
pjits as a single XLA program.  Freeze-aware loss routing mirrors the
reference (`modeling/meta_arch/planercnn.py:96-109`,
`modeling/roi_heads/roi_heads.py:132-144`): frozen modules neither compute
losses nor receive updates (optax mask in `optimizer.py`).

Batch contract (all fixed-shape, padded; see `data/` mapper):
  images     (B, H, W, 3)  preprocessed float32/bf16
  gt_boxes   (B, G, 4)     XYXY absolute pixels
  gt_classes (B, G) int32
  gt_valid   (B, G) bool
  gt_masks   (B, G, H, W)  binary float     [mask_on]
  gt_planes  (B, G, 3)                       [plane_on]
  gt_rot_axis / gt_tran_axis (B, G, 4)  (sin, cos, offset, valid)  [axis_on]
  gt_depth   (B, Hd, Wd)                     [depth_on]
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.planercnn import PlaneRCNN, init_params
from .optimizer import build_optimizer
from .targets import detection_losses, rpn_losses


class TrainState(NamedTuple):
    step: jnp.ndarray          # () int32
    params: Any                # model parameter pytree
    batch_stats: Any           # BatchNorm running stats (depth head)
    opt_state: Any             # optax state


def create_train_state(config: Config, rng: jax.Array,
                       batch_size: int = 1) -> Tuple[PlaneRCNN, TrainState]:
    """Initialize model params + batch stats + optimizer state."""
    model, variables = init_params(config, rng, batch_size=batch_size)
    params = variables["params"]
    tx = build_optimizer(config, params)
    return model, TrainState(step=jnp.zeros((), jnp.int32), params=params,
                             batch_stats=variables.get("batch_stats", {}),
                             opt_state=tx.init(params))


def compute_losses(model: PlaneRCNN, params, batch_stats,
                   batch: Dict[str, jnp.ndarray], key: jax.Array,
                   config: Config) -> Tuple[Dict[str, jnp.ndarray], Any]:
    """All enabled losses for one batch.  Returns (losses, new_batch_stats)."""
    k_sample, = jax.random.split(key, 1)
    (outputs, rois), mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["images"], batch["gt_boxes"], batch["gt_classes"],
        batch["gt_valid"], k_sample,
        method=PlaneRCNN.train_forward, mutable=["batch_stats"])

    losses: Dict[str, jnp.ndarray] = {}
    if "proposal_generator" not in config.model.freeze:
        losses.update(rpn_losses(outputs["rpn_raw"], batch["gt_boxes"],
                                 batch["gt_valid"], key, config))
    gt = {
        "boxes": batch["gt_boxes"],
        "classes": batch["gt_classes"],
        "valid": batch["gt_valid"],
    }
    for src, dst in (("gt_masks", "masks"), ("gt_planes", "planes"),
                     ("gt_rot_axis", "rot_axis"), ("gt_tran_axis", "tran_axis"),
                     ("gt_depth", "depth")):
        if src in batch:
            gt[dst] = batch[src]
    losses.update(detection_losses(outputs, rois, gt, config))
    return losses, mutated.get("batch_stats", {})


def make_train_step(config: Config, model: PlaneRCNN,
                    tx: optax.GradientTransformation):
    """Build the pure train-step function (jit/pjit it at the call site).

    Note on data-parallel collectives: the SPMD partitioner materializes the
    gradient all-reduce at each leaf's batch-reduction point regardless of
    downstream sharding constraints (verified against the compiled HLO), so
    the ~14 combiner-capped tuple all-reduces cannot be coalesced from this
    level; XLA's combiner exposes no CPU-side threshold flag.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            losses, new_stats = compute_losses(
                model, params, state.batch_stats, batch, key, config)
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), metrics

    return train_step
