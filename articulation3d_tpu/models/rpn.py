"""Region Proposal Network — anchors, head, fixed-shape proposal selection.

Behavioral spec (reference `config/config.yaml:38-54,270-297` + detectron2
RPN/StandardRPNHead/DefaultAnchorGenerator):
  * one anchor size per level (32..512) x ratios (0.5, 1, 2), offset 0;
  * head: shared 3x3 conv + ReLU, then 1x1 objectness (A) and 1x1 deltas (4A);
  * proposal selection per level: top `pre_nms_topk` by objectness, decode
    deltas (weights 1,1,1,1), clip to image, drop tiny boxes (min_size 0),
    NMS 0.7, then across levels keep top `post_nms_topk` by score.

Everything runs with static shapes: per-level topk is a `lax.top_k` over the
flattened (H*W*A) logits, and the final proposals are a fixed-capacity
(post_nms_topk, 4) array with a validity mask.  This mirrors d2's
`find_top_rpn_proposals` (which concatenates per-level NMS survivors and
takes the score-sorted head) without any dynamic shapes.

Training targets (IoU thresholds 0.3/0.7, 256 anchors/image at 0.5 positive
fraction) live in `articulation3d_tpu/train/targets.py`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import AnchorConfig, RPNConfig
from ..ops.box_ops import decode_deltas, clip_boxes, nonempty
from ..ops.nms import nms_mask, select_top, top_k, NEG_INF


def generate_cell_anchors(size: float, aspect_ratios: Sequence[float]) -> np.ndarray:
    """detectron2 `generate_cell_anchors`: centered XYXY anchors for one size."""
    anchors = []
    area = size * size
    for ar in aspect_ratios:
        w = math.sqrt(area / ar)
        h = ar * w
        anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, np.float32)


def anchors_for_level(feat_h: int, feat_w: int, stride: int, size: float,
                      aspect_ratios: Sequence[float], offset: float = 0.0) -> np.ndarray:
    """(H*W*A, 4) anchors for one FPN level, row-major over (y, x, anchor)."""
    cell = generate_cell_anchors(size, aspect_ratios)  # (A, 4)
    shift_x = (np.arange(feat_w) + offset) * stride
    shift_y = (np.arange(feat_h) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).astype(np.float32)  # (H, W, 4)
    a = shifts[:, :, None, :] + cell[None, None, :, :]  # (H, W, A, 4)
    return a.reshape(-1, 4)


class RPNHead(nn.Module):
    """StandardRPNHead: 3x3 conv+ReLU -> 1x1 objectness & 1x1 anchor deltas.

    `num_conv > 1` gives the DRPN variant (reference
    `modeling/proposal_generator/drpn.py:13-28`): the single conv becomes a
    stack of 5 3x3 convs with NO intermediate activations (torch Sequential
    of plain Conv2d), ReLU applied once after the stack (d2 StandardRPNHead
    forward wraps `self.conv` in one relu).
    """

    num_anchors: int
    conv_dim: int = 256
    num_conv: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        if self.num_conv == 1:
            convs = [nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="conv")]
        else:
            convs = [nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"conv_{i}") for i in range(self.num_conv)]
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="anchor_deltas")
        logits, regs = [], []
        for f in features:
            t = f
            for c in convs:
                t = c(t)
            t = nn.relu(t)
            logits.append(obj(t))
            regs.append(deltas(t))
        return logits, regs


def select_proposals_single(level_logits: Sequence[jnp.ndarray],
                            level_deltas: Sequence[jnp.ndarray],
                            level_anchors: Sequence[jnp.ndarray],
                            *, image_height: int, image_width: int,
                            pre_nms_topk: int, post_nms_topk: int,
                            nms_thresh: float, min_size: float,
                            bbox_reg_weights=(1.0, 1.0, 1.0, 1.0)
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Proposal selection for ONE image. Inputs per level:
      logits (H, W, A), deltas (H, W, A*4), anchors (H*W*A, 4).
    Returns (boxes (K, 4), scores (K,), valid (K,)) with K = post_nms_topk.
    """
    all_boxes, all_scores, all_valid = [], [], []
    for logit, delta, anchors in zip(level_logits, level_deltas, level_anchors):
        n = anchors.shape[0]
        scores = logit.reshape(n).astype(jnp.float32)
        deltas = delta.reshape(n, 4).astype(jnp.float32)
        k = min(pre_nms_topk, n)
        top_scores, idx = top_k(scores, k)
        boxes = decode_deltas(deltas[idx], anchors[idx], bbox_reg_weights)
        boxes = clip_boxes(boxes, image_height, image_width)
        valid = nonempty(boxes, min_size)
        # d2 also drops non-finite boxes
        valid &= jnp.all(jnp.isfinite(boxes), axis=-1)
        keep = nms_mask(boxes, top_scores, valid, nms_thresh)
        all_boxes.append(boxes)
        all_scores.append(top_scores)
        all_valid.append(keep)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    valid = jnp.concatenate(all_valid, axis=0)

    idx, out_valid = select_top(scores, valid, post_nms_topk)
    return boxes[idx], jnp.where(out_valid, scores[idx], NEG_INF), out_valid


class RPN(nn.Module):
    """Full RPN over FPN levels; returns per-image padded proposals.

    Proposals: dict(boxes (B, K, 4), scores (B, K), valid (B, K)) plus the
    raw per-level (logits, deltas) needed by the training loss.
    """

    cfg: RPNConfig = RPNConfig()
    anchor_cfg: AnchorConfig = AnchorConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], *,
                 image_height: int, image_width: int, training: bool = False):
        feats = [features[f] for f in self.cfg.in_features]
        num_anchors = len(self.anchor_cfg.aspect_ratios)
        logits, deltas = RPNHead(num_anchors, num_conv=self.cfg.head_convs,
                                 dtype=self.dtype, name="head")(feats)

        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
        anchors = []
        for i, fname in enumerate(self.cfg.in_features):
            h, w = feats[i].shape[1], feats[i].shape[2]
            anchors.append(jnp.asarray(anchors_for_level(
                h, w, strides[fname], self.anchor_cfg.sizes[i][0],
                self.anchor_cfg.aspect_ratios, self.anchor_cfg.offset)))

        pre = self.cfg.pre_nms_topk_train if training else self.cfg.pre_nms_topk_test
        post = self.cfg.post_nms_topk_train if training else self.cfg.post_nms_topk_test

        def per_image(lgts, dlts):
            return select_proposals_single(
                lgts, dlts, anchors,
                image_height=image_height, image_width=image_width,
                pre_nms_topk=pre, post_nms_topk=post,
                nms_thresh=self.cfg.nms_thresh, min_size=self.cfg.min_size,
                bbox_reg_weights=self.cfg.bbox_reg_weights)

        boxes, scores, valid = jax.vmap(per_image)(logits, deltas)
        proposals = {"boxes": boxes, "scores": scores, "valid": valid}
        raw = {"logits": logits, "deltas": deltas, "anchors": anchors}
        return proposals, raw
