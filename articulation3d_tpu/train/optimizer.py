"""Optimizer: SGD momentum + WarmupMultiStepLR + module-path freezing.

Reference solver (`config/config.yaml:315-341`): SGD momentum 0.9, base LR
1e-3, WarmupMultiStepLR with linear warmup (factor 1e-3 over 1000 iters) and
x0.1 decays at the configured steps, weight decay 1e-4 (0 for norm params).

Freezing keeps the reference's `MODEL.FREEZE` contract
(`modeling/meta_arch/planercnn.py:51-58`): entries are module paths like
"backbone" or "roi_heads.axis_head"; any parameter whose pytree path starts
with a frozen path gets zero updates (optax.multi_transform mask).

Path mapping from reference module names to our param tree:
  backbone            -> params["backbone"], params["fpn"]
  proposal_generator  -> params["rpn"]
  roi_heads.box_head / roi_heads.box_predictor -> params["box_head"] (fc* vs
                         cls_score/bbox_pred leaves)
  roi_heads.mask_head -> params["mask_head"]
  roi_heads.plane_head-> params["plane_head"]
  roi_heads.axis_head -> params["axis_head"]
  depth_head          -> params["depth_head"]
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config

# reference module path -> predicate over our param path
_BOX_PREDICTOR_LEAVES = ("cls_score", "bbox_pred")


def _path_strs(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return tuple(out)


def param_is_frozen(path_keys: Sequence[str], freeze: Sequence[str]) -> bool:
    """Does a parameter path (e.g. ('backbone','res2_0',...)) fall under any
    frozen reference module path?"""
    top = path_keys[0] if path_keys else ""
    for f in freeze:
        if f == "backbone" and top in ("backbone", "fpn"):
            return True
        if f == "proposal_generator" and top == "rpn":
            return True
        if f == "roi_heads.box_head" and top == "box_head" and \
                not any(k in _BOX_PREDICTOR_LEAVES for k in path_keys):
            return True
        if f == "roi_heads.box_predictor" and top == "box_head" and \
                any(k in _BOX_PREDICTOR_LEAVES for k in path_keys):
            return True
        if f == "roi_heads.mask_head" and top == "mask_head":
            return True
        if f == "roi_heads.plane_head" and top == "plane_head":
            return True
        if f == "roi_heads.axis_head" and top == "axis_head":
            return True
        if f == "depth_head" and top == "depth_head":
            return True
        if f == "roi_heads" and top in ("box_head", "mask_head", "plane_head",
                                        "axis_head"):
            return True
    return False


def freeze_mask(params, freeze: Sequence[str]):
    """Pytree of bools: True = trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [not param_is_frozen(_path_strs(path), freeze) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _is_norm_or_bias(path_keys: Sequence[str]) -> bool:
    last = path_keys[-1] if path_keys else ""
    if last == "bias":
        return True
    # FrozenBatchNorm / BatchNorm scale params live under "norm"/"bn"
    return any(k in ("norm", "bn") for k in path_keys[:-1])


def warmup_multistep_schedule(cfg: Config) -> optax.Schedule:
    s = cfg.solver

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(step / jnp.maximum(s.warmup_iters, 1), 0.0, 1.0)
        warmup_scale = s.warmup_factor * (1.0 - warm) + warm
        decay = jnp.asarray(1.0, jnp.float32)
        for milestone in s.steps:
            decay = decay * jnp.where(step >= milestone, s.gamma, 1.0)
        return s.base_lr * warmup_scale * decay

    return schedule


def build_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    s = cfg.solver
    schedule = warmup_multistep_schedule(cfg)

    # weight decay mask: decay everything except norm scales/biases
    # (reference WEIGHT_DECAY_NORM: 0.0; bias decay == weight decay there, so
    # we decay biases too, matching WEIGHT_DECAY_BIAS 1e-4)
    def decay_mask(p):
        flat, treedef = jax.tree_util.tree_flatten_with_path(p)
        leaves = [not any(k in ("norm", "bn") for k in _path_strs(path))
                  for path, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    tx = optax.chain(
        optax.add_decayed_weights(s.weight_decay, mask=decay_mask),
        optax.sgd(learning_rate=schedule, momentum=s.momentum, nesterov=False),
    )
    if s.clip_gradients:
        tx = optax.chain(optax.clip(s.clip_value), tx)

    trainable = freeze_mask(params, cfg.model.freeze)
    label = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label)
