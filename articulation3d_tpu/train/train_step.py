"""The jitted training step: forward -> losses -> SGD update.

Replaces the reference's detectron2 `DefaultTrainer.run_step` (d2 engine loop
driving `PlaneRCNN.forward` loss dicts, `tools/train_net.py:23-69`) with one
pure function `(TrainState, batch, key) -> (TrainState, metrics)` that jits /
pjits as a single XLA program.  Freeze-aware loss routing mirrors the
reference (`modeling/meta_arch/planercnn.py:96-109`,
`modeling/roi_heads/roi_heads.py:132-144`): frozen modules neither compute
losses nor receive updates (optax mask in `optimizer.py`).

Batch contract (all fixed-shape, padded; see `data/` mapper):
  images     (B, H, W, 3)  RAW BGR pixels, uint8 (normalized on device)
  gt_boxes   (B, G, 4)     XYXY absolute pixels
  gt_classes (B, G) int32
  gt_valid   (B, G) bool
  gt_masks   (B, G, H, W)  binary float     [mask_on]
    (or gt_masks_packed (B, G, H, ceil(W/8)) uint8 — np.packbits along W,
     unpacked on device by `unpack_bitmasks`; what the train mapper ships)
  gt_planes  (B, G, 3)                       [plane_on]
  gt_rot_axis / gt_tran_axis (B, G, 4)  (sin, cos, offset, valid)  [axis_on]
  gt_depth   (B, Hd, Wd)  f32 meters         [depth_on]
    (or gt_depth_mm (B, Hd, Wd) uint16 millimeters — divided by the d2
     depth_shift=1000 on device; what the train mapper ships for u16 files)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.planercnn import PlaneRCNN, init_params
from .optimizer import build_optimizer
from .targets import detection_losses, per_image_keys, rpn_losses


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


def unpack_bitmasks(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """Device-side inverse of `np.packbits(masks, axis=-1)`.

    packed (..., ceil(W/8)) uint8 -> (..., W) float32 in {0, 1}.  Pure
    shift/mask/reshape — XLA fuses it into the consumer, so the 8x
    host->device payload saving costs nothing on chip."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)            # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    return bits[..., :width].astype(jnp.float32)


def compute_losses(model: PlaneRCNN, params, batch_stats,
                   batch: Dict[str, jnp.ndarray], key: jax.Array,
                   config: Config) -> Tuple[Dict[str, jnp.ndarray], Any]:
    """All enabled losses for one batch.  Returns (losses, new_batch_stats).

    `key` is either a scalar PRNG key or per-image keys (B, 2).  Randomness
    (ROI sampling, RPN anchor subsampling) is derived PER IMAGE from these
    keys, so a batch sharded over devices (per-image keys presplit from the
    global batch index by `make_sharded_train_step`) samples identically to
    the same batch on one device.

    `batch["images"]` are RAW BGR pixels (uint8 from the mapper, or any
    float dtype in the 0..255 domain): mean/std normalization happens HERE,
    on device — the d2 meta-arch normalizes inside the model too
    (`preprocess_image`, reference `modeling/meta_arch/planercnn.py:62-70`),
    and shipping uint8 instead of f32 quarters the host->device payload
    (59 -> 15 MB per 16-image 480x640 batch; the dominant trainer wall cost
    on high-latency clients, PROFILE.md)."""
    icfg = config.input
    images = ((batch["images"].astype(jnp.float32)
               - jnp.asarray(icfg.pixel_mean, jnp.float32))
              / jnp.asarray(icfg.pixel_std, jnp.float32))
    base = per_image_keys(key, images.shape[0])               # (B, 2)
    k_roi = jax.vmap(lambda k: jax.random.fold_in(k, 0))(base)
    k_rpn = jax.vmap(lambda k: jax.random.fold_in(k, 1))(base)
    (outputs, rois), mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images, batch["gt_boxes"], batch["gt_classes"],
        batch["gt_valid"], k_roi,
        method=PlaneRCNN.train_forward, mutable=["batch_stats"])

    losses: Dict[str, jnp.ndarray] = {}
    if "proposal_generator" not in config.model.freeze:
        losses.update(rpn_losses(outputs["rpn_raw"], batch["gt_boxes"],
                                 batch["gt_valid"], k_rpn, config))
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
    # compact wire encodings from the train mapper (PROFILE.md: the trainer
    # wall is payload-bound on high-latency clients)
    if "gt_masks_packed" in batch:
        gt["masks"] = unpack_bitmasks(batch["gt_masks_packed"],
                                      images.shape[2])
    if "gt_depth_mm" in batch:
        gt["depth"] = batch["gt_depth_mm"].astype(jnp.float32) / 1000.0
    losses.update(detection_losses(outputs, rois, gt, config))
    return losses, mutated.get("batch_stats", {})


def make_train_step(config: Config, model: PlaneRCNN,
                    tx: optax.GradientTransformation):
    """Build the pure train-step function for a SINGLE device (jit at the
    call site).  For multi-device training use `make_sharded_train_step`,
    which syncs gradients with exactly one fused collective; pjit-ing this
    function over a mesh also works but lets the SPMD partitioner
    materialize an all-reduce at each leaf's batch-reduction point (~14
    combiner-capped tuple all-reduces, verified against the compiled HLO).
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


def make_multi_step(step_fn, k: int):
    """Fuse `k` consecutive train steps into ONE dispatched program.

    `step_fn` is a `(state, batch, key) -> (state, metrics)` train step —
    either `make_train_step`'s single-device function or the shard_mapped
    function from `make_sharded_train_step`.  The result consumes a pytree
    of k stacked batches (leading axis k on every leaf) and runs
    `lax.scan` threading the TrainState, returning the final state and the
    per-step metrics stacked along a leading k axis.

    Numerics are IDENTICAL to k separate `step_fn` calls with the same
    `key` (pinned by `tests/test_trainer.py::test_multi_step_identity`):
    each step derives its randomness by folding `state.step` into the key,
    and scan threads the incremented step counter exactly like the host
    loop does.

    Why this exists: each dispatch's outputs materialize as remote buffer
    handles on high-latency PJRT clients — a TrainState holds ~600 leaves,
    measured at ~1.4 s/step of pure dispatch tax over the dev tunnel
    (PROFILE.md "quiet-window training walls") while the device step is
    ~0.3-0.5 s.  One dispatch per k steps divides that tax by k.  The
    reference's d2 engine loop is strictly per-iteration
    (`/root/reference/articulation3d/tools/train_net.py:84-104`).
    """
    if k < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {k}")

    def multi_step(state: TrainState, batches, key: jax.Array):
        def body(s, b):
            return step_fn(s, b, key)
        return jax.lax.scan(body, state, batches, length=k)

    return multi_step


def make_repeat_step(step_fn, k: int):
    """Like `make_multi_step` but runs k steps on ONE batch (xs=None scan).

    For overfit-one-batch drives (`tools/train_on_chip.py`) where stacking
    k copies of a 480x640 batch would waste HBM; per-step randomness still
    differs (each step folds its own `state.step` into the key)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def repeat_step(state: TrainState, batch, key: jax.Array):
        def body(s, _):
            return step_fn(s, batch, key)
        return jax.lax.scan(body, state, None, length=k)

    return repeat_step


def stack_batches(batches):
    """Host-side helper: stack k mapper batches into the (k, ...) pytree
    `make_multi_step` consumes."""
    import numpy as np
    keys = batches[0].keys()
    return {kk: np.stack([b[kk] for b in batches]) for kk in keys}


def make_sharded_train_step(config: Config, model: PlaneRCNN,
                            tx: optax.GradientTransformation,
                            mesh, axis_name: str = "data"):
    """Data-parallel train step over a mesh with ONE fused collective.

    The TPU-native replacement for the reference's DDP gradient all-reduce
    (`tools/train_net.py:107-117`, NCCL per-bucket all-reduce): the step is
    `shard_map`ped over the batch axis, each device computes losses and
    gradients on its local shard, and gradients + new batch stats + metrics
    are raveled into a single flat vector synced by one `psum` — one ICI
    collective per step on TPU, one thread rendezvous per step on the
    virtual-device CPU mesh (where every extra rendezvous costs seconds).

    Semantics match DDP, not the global-batch program: losses with
    data-dependent normalizers (num_fg, num_sampled, axis-valid counts) are
    normalized per device and then averaged, exactly like per-GPU losses
    under DDP gradient averaging.  BatchNorm running stats (depth head) are
    averaged across devices each step (the reference keeps per-rank local
    stats and saves rank 0's; averaging is deterministic and equivalent in
    expectation).

    ROI/anchor sampling keys are presplit from the GLOBAL batch index, so
    the sampled ROIs for any image do not depend on the device it landed on.

    Returns a function (state, batch, key) -> (state, metrics) already
    shard_mapped; jit it at the call site (donate_argnums=(0,) recommended).
    State must be replicated, batch sharded along the leading axis.
    """
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:                        # older jax
        from jax.experimental.shard_map import shard_map
    n_dev = mesh.shape[axis_name]

    def local_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key = jax.random.fold_in(key, state.step)
        local_b = batch["images"].shape[0]
        # per-image keys from the GLOBAL index: split for the whole batch
        # (replicated computation), slice this device's rows
        all_keys = jax.random.split(key, local_b * n_dev)
        idx = jax.lax.axis_index(axis_name)
        image_keys = jax.lax.dynamic_slice_in_dim(all_keys, idx * local_b,
                                                  local_b)

        def loss_fn(params):
            losses, new_stats = compute_losses(
                model, params, state.batch_stats, batch, image_keys, config)
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = dict(losses)
        metrics["total_loss"] = total

        # ONE collective: ravel TRAINABLE grads + BN stats + metrics into a
        # flat f32 vector, psum, unravel.  Frozen-parameter grads are never
        # synced: the optimizer zeroes their updates (`optax.set_to_zero`),
        # so replication of the params is preserved while the collective
        # payload shrinks to the trainable set — on the reference's stage-2/3
        # freeze recipes that halves the per-step ICI traffic.
        from .optimizer import freeze_mask
        tmask = jax.tree_util.tree_leaves(
            freeze_mask(state.params, config.model.freeze))
        gleaves, gdef = jax.tree_util.tree_flatten(grads)
        synced = [g for g, t in zip(gleaves, tmask) if t]
        if config.solver.grad_sync_dtype == "bfloat16":
            # bf16 gradient compression: halves the collective payload, but
            # the cross-device ACCUMULATION itself is bf16 (not just the
            # transport) — pre-scaling by 1/n_dev bounds partial-sum
            # magnitude growth, yet the mean still carries bf16's 8-bit
            # mantissa.  Fine at 2-8 devices; keep the float32 default for
            # large meshes.  Stats/metrics sync exactly in a second, tiny
            # f32 collective.
            gflat, gunravel = ravel_pytree(synced)
            gflat = jax.lax.psum((gflat / n_dev).astype(jnp.bfloat16),
                                 axis_name).astype(jnp.float32)
            synced = gunravel(gflat)
            mflat, munravel = ravel_pytree((new_stats, metrics))
            mflat = jax.lax.psum(mflat, axis_name) / n_dev
            new_stats, metrics = munravel(mflat)
        else:
            flat, unravel = ravel_pytree((synced, new_stats, metrics))
            flat = jax.lax.psum(flat, axis_name) / n_dev
            synced, new_stats, metrics = unravel(flat)
        synced = iter(synced)
        gleaves = [next(synced) if t else g for g, t in zip(gleaves, tmask)]
        grads = jax.tree_util.tree_unflatten(gdef, gleaves)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), metrics

    kw = {}
    try:  # the replication checker chokes on some optax update ops; outputs
        import inspect  # are replicated by construction (post-psum inputs)
        if "check_vma" in inspect.signature(shard_map).parameters:
            kw["check_vma"] = False
        else:
            kw["check_rep"] = False
    except (TypeError, ValueError):
        kw["check_rep"] = False
    return shard_map(local_step, mesh=mesh,
                     in_specs=(P(), P(axis_name), P()),
                     out_specs=(P(), P()), **kw)
