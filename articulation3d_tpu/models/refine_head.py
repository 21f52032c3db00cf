"""Mask-refinement head (NVIDIA PlaneRCNN style) — fixed-capacity TPU port.

Re-implements the reference `PlaneRCNNRefineHead` / `RefinementNet` /
`RefinementBlockMask` (`modeling/refine_net/refine_head.py:25-290`):

  * per-instance U-Net over [image(3) | raw_depth(1) | mask(1) |
    plane-XYZ(3) | other-masks(1)] at 192x256;
  * cross-instance `accumulate` pooling: each level concatenates the mean of
    the OTHER instances' features (`refine_head.py:90-91`);
  * a global branch from cross-instance means predicting the background
    logit (`refine_head.py:114-118`);
  * plane offsets recomputed from the predicted depth inside each soft mask
    (`refine_head.py:240-252`), plane-induced XYZ maps via `planeXYZModule`
    with depth clamped to [0, 10] (`refine_head.py:178-194`).

TPU-first differences: the dynamic instance list becomes a fixed stack of D
detections with a validity mask — invalid rows are excluded from every
cross-instance sum/mean and masked out of the loss and the inference argmax.
The rays use the EVAL intrinsics convention (x right, y forward, z up):
ranges = [u, 1, -v] with f=571.623718 (`refine_head.py:167-176`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import RefineHeadConfig


def refine_ranges(h: int = 480, w: int = 640,
                  focal_length: float = 571.623718) -> np.ndarray:
    """(h, w, 3) rays [u, 1, -v] (reference `get_ranges`,
    refine_head.py:167-176)."""
    u = ((np.arange(w, dtype=np.float32) + 0.5) - w / 2.0) / focal_length
    v = ((np.arange(h, dtype=np.float32) + 0.5) - h / 2.0) / focal_length
    uu = np.tile(u[None, :], (h, 1))
    vv = np.tile(v[:, None], (1, w))
    return np.stack([uu, np.ones_like(uu), -vv], axis=-1)


def plane_xyz_module(planes: jnp.ndarray, ranges: jnp.ndarray,
                     max_depth: float = 10.0) -> jnp.ndarray:
    """Plane-induced XYZ maps (reference `planeXYZModule`,
    refine_head.py:178-194).

    planes: (D, 3) normal*offset in ranges convention; ranges: (H, W, 3).
    Returns (D, H, W, 3).
    """
    # sqrt'd sum-of-squares with the zero-row guard folded in: d||p||/dp is
    # 0/0 at p == 0, and an all-zero plane row (padded detection slot) would
    # otherwise poison the training gradients with NaN (models/heads.py
    # safe_unit has the full story)
    sq = jnp.sum(jnp.square(planes), axis=-1, keepdims=True)
    offsets = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    offsets = jnp.where(sq > 0, offsets, 0.0)                      # (D, 1)
    normals = planes / jnp.clip(offsets, 1e-4)                     # (D, 3)
    nx = jnp.einsum("hwc,dc->dhw", ranges, normals)
    nx = jnp.where(nx == 0.0, 1e-4, nx)
    depths = jnp.clip(offsets[:, :, None] / nx, 0.0, max_depth)    # (D, H, W)
    return depths[..., None] * ranges[None]


def recompute_plane_offsets(normals: jnp.ndarray, masks: jnp.ndarray,
                            depth: jnp.ndarray, ranges: jnp.ndarray
                            ) -> jnp.ndarray:
    """offset = mean of n . (depth * ray) inside each soft mask
    (reference refine_head.py:249-251).  Returns planes = n * offset (D, 3)."""
    xyz = ranges * depth[..., None]                                 # (H, W, 3)
    ndot = jnp.einsum("dc,hwc->dhw", normals, xyz)                  # (D, H, W)
    num = (ndot * masks).sum(axis=(1, 2))
    den = jnp.clip(masks.sum(axis=(1, 2)), 1e-4)
    return normals * (num / den)[:, None]


class ConvBlock(nn.Module):
    """conv/deconv + ReLU, no norm (use_bn=False throughout the reference's
    RefinementBlockMask, refine_head.py:72)."""

    features: int
    kernel: int = 3
    stride: int = 1
    mode: str = "conv"   # "conv" | "deconv"

    @nn.compact
    def __call__(self, x):
        if self.mode == "conv":
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME")(x)
        else:
            # torch ConvTranspose2d(k=4, s=2, p=1) == exact 2x upsample;
            # flax "SAME" transposed padding reproduces it (out = in * stride)
            x = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                                 strides=(self.stride, self.stride),
                                 padding="SAME")(x)
        return nn.relu(x)


class RefinementBlock(nn.Module):
    """Per-image instance-stack U-Net (reference `RefinementBlockMask`,
    refine_head.py:68-119).  All inputs are NHWC stacks over D instances."""

    @staticmethod
    def _accumulate(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """concat[x, mean of other valid instances] (refine_head.py:90-91)."""
        v = valid.astype(x.dtype)[:, None, None, None]
        total = (x * v).sum(axis=0, keepdims=True)
        count = valid.sum().astype(x.dtype)
        others = (total - x * v) / jnp.maximum(count - 1.0, 1.0)
        return jnp.concatenate([x, others], axis=-1)

    @staticmethod
    def _mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        v = valid.astype(x.dtype)[:, None, None, None]
        count = jnp.maximum(valid.sum().astype(x.dtype), 1.0)
        return (x * v).sum(axis=0, keepdims=True) / count

    @nn.compact
    def __call__(self, image: jnp.ndarray, masks: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
        """image (D, h, w, 3); masks (D, h, w, 6); valid (D,) ->
        (D+1, h, w) logits: [global background, per-instance]."""
        acc = lambda x: self._accumulate(x, valid)
        x0 = ConvBlock(32)(jnp.concatenate([image, masks], axis=-1))
        x1 = ConvBlock(64, stride=2)(acc(x0))
        x1 = ConvBlock(64)(acc(x1))
        x2 = ConvBlock(128, stride=2)(acc(x1))
        x2 = ConvBlock(128)(acc(x2))

        y2 = ConvBlock(64, kernel=4, stride=2, mode="deconv")(x2)
        y1 = ConvBlock(32, kernel=4, stride=2, mode="deconv")(
            jnp.concatenate([y2, x1], axis=-1))
        y0 = ConvBlock(16)(jnp.concatenate([y1, x0], axis=-1))
        y0 = nn.Conv(1, (3, 3), padding="SAME", name="pred")(y0)

        g2 = ConvBlock(64, kernel=4, stride=2, mode="deconv",
                       name="global_up_2")(self._mean(x2, valid))
        g1 = ConvBlock(32, kernel=4, stride=2, mode="deconv",
                       name="global_up_1")(
            jnp.concatenate([g2, self._mean(x1, valid)], axis=-1))
        g0 = ConvBlock(16, name="global_pred_conv")(
            jnp.concatenate([g1, self._mean(x0, valid)], axis=-1))
        g0 = nn.Conv(1, (3, 3), padding="SAME", name="global_pred")(g0)

        return jnp.concatenate([g0[..., 0], y0[..., 0]], axis=0)  # (D+1, h, w)


def _resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize of the trailing-2 spatial dims of a (..., H, W) array
    (torch F.interpolate(mode='bilinear', align_corners=False)).

    antialias=False matches torch: the refine input resize 480x640->192x256
    (reference refine_head.py:257-263) is a downsample, and torch's
    interpolate never antialiases."""
    shape = x.shape[:-2] + (h, w)
    return jax.image.resize(x, shape, method="linear", antialias=False)


class RefineHead(nn.Module):
    """Per-image refine pass.  vmap over the batch at the call site."""

    config: RefineHeadConfig

    @nn.compact
    def __call__(self, raw_image: jnp.ndarray, soft_masks: jnp.ndarray,
                 planes: jnp.ndarray, depth: jnp.ndarray,
                 valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args (one image):
          raw_image  (H, W, 3) BGR 0..255 (reference divides by 255,
                     refine_head.py:255);
          soft_masks (D, H, W) pasted soft masks in [0, 1] (the reference's
                     threshold=-1 postprocess output /255);
          planes     (D, 3) unit plane normals (plane-head output, ranges
                     convention);
          depth      (H, W) predicted depth;
          valid      (D,) bool.
        Returns (logits (D+1, hr, wr), plane_params (D, 3)).
        """
        cfg = self.config
        full_h, full_w = depth.shape
        ranges = jnp.asarray(refine_ranges(full_h, full_w, cfg.focal_length))
        d = soft_masks.shape[0]

        vmask = valid.astype(jnp.float32)[:, None, None]
        masks = soft_masks * vmask
        plane_params = recompute_plane_offsets(planes, masks, depth, ranges)
        plane_params = jnp.where(valid[:, None], plane_params, 0.0)
        xyz_plane = plane_xyz_module(plane_params, ranges, cfg.max_depth)

        hr, wr = cfg.height, cfg.width
        image = _resize(jnp.moveaxis(raw_image / 255.0, -1, 0), hr, wr)
        image = jnp.broadcast_to(jnp.moveaxis(image, 0, -1)[None],
                                 (d, hr, wr, 3))
        masks_r = _resize(masks, hr, wr)                          # (D, hr, wr)
        xyz_r = _resize(jnp.moveaxis(xyz_plane, -1, 1), hr, wr)   # (D, 3, hr, wr)
        depth_r = _resize(depth[None], hr, wr)                    # (1, hr, wr)

        # channel layout of the reference's prev_predictions
        # (refine_head.py:144-149): [raw_depth, mask, XYZ_plane(3), others]
        others = ((masks_r * vmask[..., :1]).sum(0, keepdims=True)
                  - masks_r * vmask[..., :1])                      # (D, hr, wr)
        stack = jnp.concatenate([
            jnp.broadcast_to(depth_r[None], (d, 1, hr, wr)),
            masks_r[:, None],
            xyz_r,
            others[:, None],
        ], axis=1)                                                 # (D, 6, hr, wr)
        stack = jnp.moveaxis(stack, 1, -1)                         # NHWC

        logits = RefinementBlock(name="refinement_block")(image, stack, valid)
        return logits, plane_params


def refine_inference_masks(logits: jnp.ndarray, valid: jnp.ndarray,
                           out_h: int, out_w: int) -> jnp.ndarray:
    """argmax over [background, instances] -> per-instance binary masks,
    resized to full resolution (reference refine_head.py:281-283)."""
    d = logits.shape[0] - 1
    gated = jnp.concatenate(
        [logits[:1], jnp.where(valid[:, None, None], logits[1:], -1e10)], 0)
    winner = jnp.argmax(gated, axis=0)                             # (hr, wr)
    onehot = (winner[None] == (1 + jnp.arange(d))[:, None, None])
    return _resize(onehot.astype(jnp.float32), out_h, out_w)


def assign_pred_masks(gt_masks: jnp.ndarray, gt_valid: jnp.ndarray,
                      pred_masks: jnp.ndarray, pred_valid: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-best-intersection matching (reference
    `assign_pred_mask_with_gt_mask`, refine_head.py:196-213).

    gt_masks (G, H, W) binary; pred_masks (D, H, W) soft.
    Returns (assigned gt index per pred (D,), valid weight (D,)).
    """
    rounded = jnp.round(pred_masks)
    inter = jnp.einsum("ghw,dhw->gd", gt_masks, rounded)
    inter = jnp.where(gt_valid[:, None] & pred_valid[None, :], inter, -1.0)
    segments_gt = jnp.argmax(inter, axis=0)                        # (D,)
    mapping = jnp.argmax(inter, axis=1)                            # (G,)
    mutual = mapping[segments_gt] == jnp.arange(pred_masks.shape[0])
    w = (mutual & pred_valid & gt_valid[segments_gt]).astype(jnp.float32)
    return segments_gt, w


def refine_loss_single(logits: jnp.ndarray, gt_masks: jnp.ndarray,
                       gt_valid: jnp.ndarray, pred_masks: jnp.ndarray,
                       pred_valid: jnp.ndarray) -> jnp.ndarray:
    """Per-image weighted cross-entropy over [bg, instances]
    (reference `loss`, refine_head.py:225-237).

    logits (D+1, hr, wr); gt_masks (G, H, W) binary; pred_masks (D, H, W)
    soft at full res (for the assignment).
    """
    hr, wr = logits.shape[1:]
    seg_idx, w_inst = assign_pred_masks(gt_masks, gt_valid, pred_masks,
                                        pred_valid)
    assigned = gt_masks[seg_idx] * w_inst[:, None, None]          # (D, H, W)
    assigned_r = _resize(assigned, hr, wr)
    bg = 1.0 - jnp.max(assigned_r, axis=0, keepdims=True)
    all_gt = jnp.concatenate([bg, assigned_r], axis=0)            # (D+1,hr,wr)
    target = jnp.argmax(all_gt, axis=0)                           # (hr, wr)

    logp = jax.nn.log_softmax(logits, axis=0)                     # (D+1,hr,wr)
    nll = -jnp.take_along_axis(logp, target[None], axis=0)[0]     # (hr, wr)
    weights = jnp.concatenate([jnp.ones((1,)), w_inst])           # (D+1,)
    pix_w = weights[target]
    loss = (nll * pix_w).sum() / jnp.maximum(pix_w.sum(), 1e-8)
    # the reference skips images with zero instances entirely
    # (refine_head.py:244-245): zero the loss when nothing is valid
    return jnp.where(pred_valid.any(), loss, 0.0)
