"""ROI heads: box (FastRCNN), mask, plane, and articulation-axis heads.

Behavioral specs:
  * Box head: 2xFC(1024) on 7x7 ROIAlignV2 features, class softmax over
    2 classes + background, per-class box deltas with weights (10,10,5,5)
    (reference `config/config.yaml:189-226`; d2 FastRCNNConvFCHead +
    FastRCNNOutputLayers).
  * Mask head: MaskRCNNConvUpsampleHead — 4x conv(256,3x3)+ReLU, 2x deconv
    upsample, 1x1 predictor; class-agnostic (`config/config.yaml:245-255`).
  * Plane head: 4x conv(256,3x3)+ReLU + FC(1024) -> 3 params, L2-normalized
    when NORMAL_ONLY (reference `modeling/roi_heads/plane_head.py:15-93`).
  * Axis head: twin conv/FC towers; rotation -> normalize(sin,cos) + offset,
    translation -> normalized (sin,cos)
    (reference `modeling/roi_heads/axis_head.py:95-132`).

Inference-time box selection (`fast_rcnn_inference`) is fixed-shape: the
(R, C) score matrix flattens to R*C candidates, score-thresholded, class-wise
NMS'd, and top-`detections_per_image` selected — identical survivors to d2's
dynamic version.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import AxisHeadConfig, BoxHeadConfig, MaskHeadConfig, PlaneHeadConfig, ROIHeadsConfig
from ..ops.box_ops import decode_deltas, clip_boxes
from ..ops.nms import batched_nms_mask, select_top


def safe_unit(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis, gradient-safe at v == 0.

    `v / max(||v||, eps)` is forward-correct at the origin but its VJP is
    NaN there (d||v||/dv = v/||v|| = 0/0), and all-zero rows DO occur in
    training: a padded or degenerate sampled ROI (e.g. the zero GT box
    appended for an all-negative image, `train/targets.py:sample_rois`)
    pools all-zero features, and the ReLU towers then output exactly 0.
    One NaN row poisons the whole head's gradient tree.  Zero rows here
    stay zero with ZERO gradient; nonzero rows match the plain quotient.
    """
    sq = jnp.sum(jnp.square(v), axis=-1, keepdims=True)
    nz = sq > 0
    n = jnp.sqrt(jnp.where(nz, sq, 1.0))
    return jnp.where(nz, v / jnp.maximum(n, eps), 0.0 * v)


class BoxHead(nn.Module):
    """FastRCNNConvFCHead (num_conv=0, num_fc=2) + FastRCNNOutputLayers."""

    cfg: BoxHeadConfig = BoxHeadConfig()
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (R, P, P, C) pooled features -> (scores (R, C+1), deltas (R, C*4))."""
        r = x.shape[0]
        x = x.reshape(r, -1).astype(self.dtype)
        for i in range(self.cfg.num_fc):
            x = nn.relu(nn.Dense(self.cfg.fc_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"fc{i + 1}")(x))
        scores = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="cls_score")(x.astype(jnp.float32))
        n_reg = 1 if self.cfg.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(n_reg * 4, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="bbox_pred")(x.astype(jnp.float32))
        return scores, deltas


def fast_rcnn_inference_single(scores: jnp.ndarray, deltas: jnp.ndarray,
                               proposal_boxes: jnp.ndarray, proposal_valid: jnp.ndarray,
                               *, image_height: int, image_width: int,
                               cfg: ROIHeadsConfig,
                               bbox_reg_weights=(10.0, 10.0, 5.0, 5.0)):
    """detectron2 `fast_rcnn_inference_single_image` with static shapes.

    Args:
      scores: (R, C+1) raw logits. deltas: (R, C*4). proposal_boxes: (R, 4).
    Returns dict(boxes (D,4), scores (D,), classes (D,), valid (D,)) with
    D = cfg.detections_per_image.
    """
    num_classes = cfg.num_classes
    probs = jax.nn.softmax(scores, axis=-1)[:, :num_classes]     # (R, C)
    r = probs.shape[0]

    deltas = deltas.reshape(r, -1, 4)
    if deltas.shape[1] == 1:
        deltas = jnp.broadcast_to(deltas, (r, num_classes, 4))
    boxes = decode_deltas(deltas, proposal_boxes[:, None, :], bbox_reg_weights)
    boxes = clip_boxes(boxes, image_height, image_width)          # (R, C, 4)

    # flatten (R, C) candidates
    flat_scores = probs.reshape(-1)
    flat_boxes = boxes.reshape(-1, 4)
    flat_classes = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (r,))
    flat_valid = (jnp.repeat(proposal_valid, num_classes)
                  & (flat_scores > cfg.score_thresh_test))

    keep = batched_nms_mask(flat_boxes, flat_scores, flat_classes, flat_valid,
                            cfg.nms_thresh_test)
    idx, valid = select_top(flat_scores, keep, cfg.detections_per_image)
    return {
        "boxes": flat_boxes[idx],
        "scores": jnp.where(valid, flat_scores[idx], 0.0),
        "classes": flat_classes[idx],
        "valid": valid,
    }


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead, class-agnostic.

    (R, 14, 14, 256) -> 4x conv+relu -> deconv 2x -> relu -> 1x1 -> (R, 28, 28).
    """

    cfg: MaskHeadConfig = MaskHeadConfig()
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(self.cfg.num_conv):
            x = nn.relu(nn.Conv(self.cfg.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(self.cfg.conv_dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name="deconv")(x))
        n_out = 1 if self.cfg.cls_agnostic else self.num_classes
        x = nn.Conv(n_out, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                    name="predictor")(x.astype(jnp.float32))
        return x  # logits (R, 28, 28, n_out)


class ConvFCTower(nn.Module):
    """Shared conv+fc tower used by plane and axis heads (NORM='' => plain)."""

    num_conv: int
    conv_dim: int
    num_fc: int
    fc_dim: int
    prefix: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(self.num_conv):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=f"{self.prefix}_conv{i + 1}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"{self.prefix}_fc{i + 1}")(x))
        return x.astype(jnp.float32)


class PlaneHead(nn.Module):
    """Plane-parameter regression head (PlaneRCNNConvFCHead)."""

    cfg: PlaneHeadConfig = PlaneHeadConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = ConvFCTower(self.cfg.num_conv, self.cfg.conv_dim, self.cfg.num_fc,
                        self.cfg.fc_dim, prefix="plane", dtype=self.dtype,
                        name="tower")(x)
        p = nn.Dense(self.cfg.param_dim, param_dtype=jnp.float32,
                     name="param_pred")(t)
        if self.cfg.normal_only:
            p = safe_unit(p)
        return p


class AxisHead(nn.Module):
    """Twin rotation/translation towers (reference axis_head.py:95-132).

    Returns (rot_axis (R, 3) = [sin, cos, offset] with (sin,cos) L2-normalized,
             tran_axis (R, 2) = normalized [sin, cos]).
    """

    cfg: AxisHeadConfig = AxisHeadConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        xr = ConvFCTower(self.cfg.num_conv, self.cfg.conv_dim, self.cfg.num_fc,
                         self.cfg.fc_dim, prefix="axis_R", dtype=self.dtype,
                         name="tower_R")(x)
        xt = ConvFCTower(self.cfg.num_conv, self.cfg.conv_dim, self.cfg.num_fc,
                         self.cfg.fc_dim, prefix="axis_T", dtype=self.dtype,
                         name="tower_T")(x)
        rot_sc = nn.Dense(2, param_dtype=jnp.float32, name="rotation")(xr)
        rot_sc = safe_unit(rot_sc)
        rot_off = nn.Dense(1, param_dtype=jnp.float32, name="offset")(xr)
        rot = jnp.concatenate([rot_sc, rot_off], axis=-1)

        tran = nn.Dense(2, param_dtype=jnp.float32, name="translation")(xt)
        tran = safe_unit(tran)
        return rot, tran


def double_angle(sin_cos: jnp.ndarray) -> jnp.ndarray:
    """[sin a, cos a] -> [sin 2a, cos 2a] (reference axis_head.py:139-148).

    Makes the translation-axis loss invariant to 180-degree flips.
    """
    sin, cos = sin_cos[..., 0], sin_cos[..., 1]
    return jnp.stack([2 * sin * cos, cos ** 2 - sin ** 2], axis=-1)
