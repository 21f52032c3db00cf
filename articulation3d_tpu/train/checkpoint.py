"""Checkpointing: orbax save/restore + detectron2/torch weight porting.

The reference checkpoints through d2 `DetectionCheckpointer`
(`tools/train_net.py:89-103`): .pth torch state dicts (or model-zoo .pkl)
with shape-tolerant loading for cross-stage warm starts.  Here:

  * native checkpoints are orbax (params + opt state + step), and
  * `port_detectron2_state_dict` maps a d2 PlaneRCNN state dict (the
    shipped `model_final.pth` or a COCO zoo `faster_rcnn_R_50_FPN_3x` pkl)
    onto our flax pytree, handling layout conversion:
      - conv (O, I, kH, kW) -> (kH, kW, I, O)
      - deconv (I, O, kH, kW) -> (kH, kW, O, I)  [flax ConvTranspose]
      - linear (O, I) -> (I, O), with CHW->HWC row reorder for the first FC
        after a conv map (torch flattens NCHW, we flatten NHWC)
  * missing keys keep their fresh initialization (the d2 warm-start
    contract: new heads are randomly initialized).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# --------------------------------------------------------------------------- #
# orbax native checkpoints
# --------------------------------------------------------------------------- #

def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp
    step = int(step if step is not None else np.asarray(state.step))
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state._asdict()))
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state):
    """Restore into the structure of `state` (a TrainState template)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)  # orbax/tensorstore rejects relative paths
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(np.asarray, state._asdict())
    restored = ckptr.restore(path, template)
    return type(state)(**restored)


def load_weights(path: str, state) -> Tuple[Any, Any, Dict[str, Any]]:
    """Weights-only, shape-tolerant warm start from an orbax checkpoint.

    The d2 cross-stage contract (`DetectionCheckpointer` under
    `resume_or_load(resume=False)`, reference `tools/train_net.py:89-103`;
    e.g. stage 2 warm-starts an axis head the stage-1 checkpoint never had,
    `config/step2_axis.yaml`): keys present in both trees with matching
    shapes load; keys the checkpoint lacks (new heads) keep their fresh
    initialization; keys the new stage dropped are ignored; the step counter
    and optimizer state are NOT restored (warm start is not resume — the new
    stage's schedule starts at iteration 0, and its optax freeze masks give
    the opt state a different tree anyway).

    Returns (params, batch_stats, stats) with numpy leaves.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)  # orbax/tensorstore rejects relative paths
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)  # template-free: raw saved tree of dicts
    stats: Dict[str, Any] = {"loaded": 0, "missing": [], "unexpected": [],
                             "shape_mismatch": []}

    def leaf_paths(tree, prefix=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from leaf_paths(v, prefix + (str(k),))
        else:
            yield prefix

    def merge(tmpl, src, prefix=()):
        if isinstance(tmpl, dict):
            out = {}
            src = src if isinstance(src, dict) else {}
            for k, v in tmpl.items():
                if k in src:
                    out[k] = merge(v, src[k], prefix + (str(k),))
                else:
                    stats["missing"].extend(
                        ".".join(p) for p in leaf_paths(v, prefix + (str(k),)))
                    out[k] = jax.tree_util.tree_map(np.asarray, v)
            for k in src:
                if k not in tmpl:
                    stats["unexpected"].extend(
                        ".".join(p)
                        for p in leaf_paths(src[k], prefix + (str(k),)))
            return out
        tmpl = np.asarray(tmpl)
        if isinstance(src, dict) or np.shape(src) != tmpl.shape:
            stats["shape_mismatch"].append(".".join(prefix))
            return tmpl
        stats["loaded"] += 1
        return np.asarray(src, tmpl.dtype)

    params = merge(jax.tree_util.tree_map(np.asarray, state.params),
                   restored.get("params", {}), ("params",))
    batch_stats = merge(
        jax.tree_util.tree_map(np.asarray, state.batch_stats),
        restored.get("batch_stats", {}), ("batch_stats",))
    return params, batch_stats, stats


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(ckpt_dir, sorted(steps)[-1])


# --------------------------------------------------------------------------- #
# torch / d2 state-dict loading
# --------------------------------------------------------------------------- #

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (torch) or .pkl (d2 zoo) checkpoint to numpy arrays."""
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    else:
        import torch
        data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    out = {}
    for k, v in data.items():
        if hasattr(v, "numpy"):
            v = v.numpy()
        out[k] = np.asarray(v)
    return out


# --------------------------------------------------------------------------- #
# name mapping d2 -> flax pytree path
# --------------------------------------------------------------------------- #

def _fc_reorder(w: np.ndarray, h: int, wd: int, c: int) -> np.ndarray:
    """torch (O, C*H*W) weight -> our (H*W*C, O) kernel."""
    o = w.shape[0]
    return w.reshape(o, c, h, wd).transpose(0, 2, 3, 1).reshape(o, -1).T


_BN_MAP = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}

# first-FC spatial shapes: (H, W, C) of the pooled map feeding the fc
_FC_SHAPES = {
    ("box_head", "fc1"): (7, 7, 256),
    ("plane_head", "tower", "plane_fc1"): (14, 14, 256),
    ("axis_head", "tower_R", "axis_R_fc1"): (14, 14, 256),
    ("axis_head", "tower_T", "axis_T_fc1"): (14, 14, 256),
}


def _map_name(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """d2 state-dict key -> (our path, kind) where kind in
    {conv, deconv, linear, bn_param, bn_stat, frozen_bn, bias}."""
    parts = key.split(".")
    last = parts[-1]

    def conv_entry(path):
        if last == "weight":
            return path + ("kernel",), "conv"
        return path + ("bias",), "bias"

    def frozen_bn(path):
        return path + (last,), "frozen_bn"  # weight/bias/running_mean/var as-is

    # ---- backbone --------------------------------------------------------
    m = re.match(r"backbone\.bottom_up\.stem\.conv1\.(.*)", key)
    if m:
        rest = m.group(1)
        if rest == "weight":
            return ("backbone", "stem", "conv", "kernel"), "conv"
        if rest.startswith("norm."):
            return ("backbone", "stem", "norm", rest.split(".", 1)[1]), "frozen_bn"
    m = re.match(r"backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)\.(.*)", key)
    if m:
        stage, block, conv, rest = m.groups()
        base = ("backbone", f"res{stage}_{block}", conv)
        if rest == "weight":
            return base + ("conv", "kernel"), "conv"
        if rest.startswith("norm."):
            return base + ("norm", rest.split(".", 1)[1]), "frozen_bn"
    m = re.match(r"backbone\.fpn_lateral(\d)\.(weight|bias)", key)
    if m:
        l, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("fpn", f"lateral_res{l}", name), ("conv" if kind == "weight" else "bias")
    m = re.match(r"backbone\.fpn_output(\d)\.(weight|bias)", key)
    if m:
        l, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("fpn", f"output_p{l}", name), ("conv" if kind == "weight" else "bias")

    # ---- rpn -------------------------------------------------------------
    m = re.match(r"proposal_generator\.rpn_head\.(conv|objectness_logits|anchor_deltas)\.(weight|bias)", key)
    if m:
        mod, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("rpn", "head", mod, name), ("conv" if kind == "weight" else "bias")
    # DRPN: rpn_head.conv is a Sequential of 5 convs (drpn.py:22-28)
    m = re.match(r"proposal_generator\.rpn_head\.conv\.(\d)\.(weight|bias)", key)
    if m:
        i, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return (("rpn", "head", f"conv_{i}", name),
                ("conv" if kind == "weight" else "bias"))

    # ---- box head --------------------------------------------------------
    m = re.match(r"roi_heads\.box_head\.fc(\d)\.(weight|bias)", key)
    if m:
        i, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("box_head", f"fc{i}", name), ("linear" if kind == "weight" else "bias")
    m = re.match(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)", key)
    if m:
        mod, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("box_head", mod, name), ("linear" if kind == "weight" else "bias")

    # ---- mask head -------------------------------------------------------
    m = re.match(r"roi_heads\.mask_head\.(mask_fcn\d|deconv|predictor)\.(weight|bias)", key)
    if m:
        mod, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        k = "deconv" if (mod == "deconv" and kind == "weight") else (
            "conv" if kind == "weight" else "bias")
        return ("mask_head", mod, name), k

    # ---- plane head ------------------------------------------------------
    m = re.match(r"roi_heads\.plane_head\.(plane_conv\d)\.(weight|bias)", key)
    if m:
        mod, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("plane_head", "tower", mod, name), ("conv" if kind == "weight" else "bias")
    m = re.match(r"roi_heads\.plane_head\.(plane_fc\d)\.(weight|bias)", key)
    if m:
        mod, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("plane_head", "tower", mod, name), ("linear" if kind == "weight" else "bias")
    m = re.match(r"roi_heads\.plane_head\.param_pred\.(weight|bias)", key)
    if m:
        kind = m.group(1)
        name = "kernel" if kind == "weight" else "bias"
        return ("plane_head", "param_pred", name), ("linear" if kind == "weight" else "bias")

    # ---- axis head -------------------------------------------------------
    m = re.match(r"roi_heads\.axis_head\.axis_([RT])_(conv|fc)(\d)\.(weight|bias)", key)
    if m:
        rt, cf, i, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        knd = ("conv" if cf == "conv" else "linear") if kind == "weight" else "bias"
        return ("axis_head", f"tower_{rt}", f"axis_{rt}_{cf}{i}", name), knd
    m = re.match(r"roi_heads\.axis_head\.(rotation|offset|translation)\.(weight|bias)", key)
    if m:
        mod, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("axis_head", mod, name), ("linear" if kind == "weight" else "bias")

    # ---- depth head ------------------------------------------------------
    m = re.match(r"depth_head\.conv(\d)\.0\.(weight|bias)", key)
    if m:
        i, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("depth_head", f"conv{i}", "conv", name), ("conv" if kind == "weight" else "bias")
    m = re.match(r"depth_head\.conv(\d)\.1\.(weight|bias|running_mean|running_var)", key)
    if m:
        i, kind = m.groups()
        return ("depth_head", f"conv{i}", "bn", kind), "torch_bn"
    m = re.match(r"depth_head\.deconv(\d)\.1\.(weight|bias)", key)
    if m:
        i, kind = m.groups()
        name = "kernel" if kind == "weight" else "bias"
        return ("depth_head", f"deconv{i}_conv", name), ("conv" if kind == "weight" else "bias")
    m = re.match(r"depth_head\.deconv(\d)\.2\.(weight|bias|running_mean|running_var)", key)
    if m:
        i, kind = m.groups()
        return ("depth_head", f"deconv{i}_bn", kind), "torch_bn"
    m = re.match(r"depth_head\.depth_pred\.(weight|bias)", key)
    if m:
        kind = m.group(1)
        name = "kernel" if kind == "weight" else "bias"
        return ("depth_head", "depth_pred", name), ("conv" if kind == "weight" else "bias")

    return None


def _convert(value: np.ndarray, kind: str, path: Tuple[str, ...]) -> np.ndarray:
    if kind == "conv":
        return value.transpose(2, 3, 1, 0)
    if kind == "deconv":
        return value.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    if kind == "linear":
        for prefix, shape in _FC_SHAPES.items():
            if path[:len(prefix)] == prefix:
                return _fc_reorder(value, *shape)
        return value.T
    return value  # bias / frozen_bn / torch_bn pass through


def port_detectron2_state_dict(state_dict: Dict[str, np.ndarray],
                               params: Any, batch_stats: Any = None
                               ) -> Tuple[Any, Any, Dict[str, int]]:
    """Map a d2 state dict onto (params, batch_stats) pytrees.

    Returns (new_params, new_batch_stats, stats) where stats counts
    loaded/skipped/missing keys.  Shape mismatches are skipped (d2's
    shape-tolerant warm start).
    """
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats or {})
    loaded, skipped = 0, 0
    unmapped = []

    def set_in(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            return False
        if node[leaf].shape != value.shape:
            return False
        node[leaf] = value.astype(node[leaf].dtype)
        return True

    for key, value in state_dict.items():
        if (key.endswith("num_batches_tracked")
                or key in ("pixel_mean", "pixel_std")
                # anchor-generator buffers: constants we compute ourselves
                or ".anchor_generator.cell_anchors" in key):
            continue
        mapped = _map_name(key)
        if mapped is None:
            unmapped.append(key)
            continue
        path, kind = mapped
        if kind == "torch_bn":
            # flax BatchNorm: weight->scale, bias->bias in params;
            # running_mean/var -> batch_stats mean/var
            leaf = path[-1]
            if leaf in _BN_MAP:
                ok = set_in(params, path[:-1] + (_BN_MAP[leaf],), value)
            else:
                ok = set_in(batch_stats, path[:-1] + (_BN_STATS[leaf],), value)
        else:
            ok = set_in(params, path, _convert(value, kind, path))
        loaded += int(ok)
        skipped += int(not ok)

    stats = {"loaded": loaded, "skipped": skipped, "unmapped": len(unmapped)}
    if unmapped:
        import logging
        logging.getLogger(__name__).info(
            "unmapped checkpoint keys (first 10): %s", unmapped[:10])
    return params, batch_stats, stats
