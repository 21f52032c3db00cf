"""Box geometry ops: IoU, Box2BoxTransform encode/decode, clipping.

Matches detectron2's `Box2BoxTransform` semantics (weights (10,10,5,5) for the
box head, (1,1,1,1) for RPN — reference `config/config.yaml:193,276`) and
`pairwise_iou` used by the tracker and matchers
(`utils/opt_utils.py:1175`, detectron2 matcher inside RPN/ROI sampling).
All functions are pure jnp and shape-polymorphic over leading dims.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# detectron2 clamps dw/dh at log(1000/16)
_SCALE_CLAMP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0)


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,4),(M,4) -> (N,M) intersection areas."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,4),(M,4) -> (N,M) IoU, 0 where union is empty."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = box_area(boxes1)[..., :, None]
    a2 = box_area(boxes2)[..., None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def encode_deltas(src_boxes: jnp.ndarray, target_boxes: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box2BoxTransform.get_deltas: regression targets src->target."""
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    eps = 1e-12
    dx = wx * (tgt_cx - src_cx) / jnp.maximum(src_w, eps)
    dy = wy * (tgt_cy - src_cy) / jnp.maximum(src_h, eps)
    dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / jnp.maximum(src_w, eps))
    dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / jnp.maximum(src_h, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas: (..., 4) deltas onto (..., 4) boxes."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * widths
    cy = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)

    pred_cx = dx * widths + cx
    pred_cy = dy * heights + cy
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack([
        pred_cx - 0.5 * pred_w,
        pred_cy - 0.5 * pred_h,
        pred_cx + 0.5 * pred_w,
        pred_cy + 0.5 * pred_h,
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """fvcore smooth_l1: pure L1 when beta == 0 (reference uses beta 0.0)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
