"""ROIAlign for TPU as a pure-XLA gather/bilinear formulation.

Re-implements the torchvision CUDA `roi_align` used by every pooler in the
reference (`modeling/roi_heads/roi_heads.py:50-55,74-79`, detectron2
`ROIPooler`), including:

  * V1 ("ROIAlign") vs V2 ("ROIAlignV2", aligned=True): V2 shifts sampling
    coordinates by -0.5 (half-pixel correction).  The reference box head uses
    V2, the mask/plane/axis heads use V1 (`config/config.yaml:206,255,269`).
  * `sampling_ratio`: fixed grid of SxS samples per bin; `0` means adaptive
    ceil(bin_size) per ROI.  On TPU shapes must be static, so adaptive mode
    samples a fixed SxS grid (S = `adaptive_cap`) and masks samples beyond the
    per-ROI adaptive count, reproducing torchvision's sample positions and
    averaging exactly for ROIs whose adaptive count <= the cap (always the
    case for FPN-assigned levels up to ~4x the canonical box size).
  * multi-level FPN pooling with detectron2's level assignment
    (`assign_boxes_to_levels`: floor(4 + log2(sqrt(area)/224))).

Everything is batched: boxes are fixed-capacity padded arrays, invalid ROIs
produce zeros.  The per-level pooling runs on all ROIs and the result is
selected by level mask — 4 small gathers beat dynamic partitioning on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at float coords y, x (...,) -> (..., C).

    Exact torchvision `bilinear_interpolate` semantics:
      * coordinates outside [-1, H] x [-1, W] contribute zero;
      * coords in [-1, 0] clamp to 0; the high index saturates at H-1.
    """
    H, W = feat.shape[0], feat.shape[1]
    out_of_range = (y < -1.0) | (y > H) | (x < -1.0) | (x > W)

    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)

    y_low = jnp.minimum(y.astype(jnp.int32), H - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), W - 1)
    y_high = jnp.minimum(y_low + 1, H - 1)
    x_high = jnp.minimum(x_low + 1, W - 1)
    # when y_low == H - 1 torchvision also snaps y to y_low
    y = jnp.where(y.astype(jnp.int32) >= H - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x.astype(jnp.int32) >= W - 1, x_low.astype(x.dtype), x)

    ly = y - y_low.astype(y.dtype)
    lx = x - x_low.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    v1 = feat[y_low, x_low]
    v2 = feat[y_low, x_high]
    v3 = feat[y_high, x_low]
    v4 = feat[y_high, x_high]

    w1 = (hy * hx)[..., None]
    w2 = (hy * lx)[..., None]
    w3 = (ly * hx)[..., None]
    w4 = (ly * lx)[..., None]

    out = w1 * v1 + w2 * v2 + w3 * v3 + w4 * v4
    return jnp.where(out_of_range[..., None], 0.0, out)


def roi_align_level(feat: jnp.ndarray, boxes: jnp.ndarray, *,
                    spatial_scale: float, output_size: int,
                    sampling_ratio: int, aligned: bool,
                    adaptive_cap: int = 4) -> jnp.ndarray:
    """ROIAlign on one feature level.

    Args:
      feat: (H, W, C) feature map (single image, channels-last).
      boxes: (N, 4) XYXY boxes in input-image coordinates.
      spatial_scale: 1/stride of this level.
      output_size: P — pooled output is (N, P, P, C).
      sampling_ratio: samples per bin per axis; 0 = adaptive (capped).
      aligned: half-pixel correction (ROIAlignV2).
    """
    P = output_size
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset

    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy: force malformed ROIs to be 1x1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / P  # (N,)
    bin_h = roi_h / P

    if sampling_ratio > 0:
        S = sampling_ratio
        n_sw = jnp.full(boxes.shape[:1], S, jnp.int32)
        n_sh = jnp.full(boxes.shape[:1], S, jnp.int32)
    else:
        S = adaptive_cap
        n_sw = jnp.clip(jnp.ceil(bin_w).astype(jnp.int32), 1, S)
        n_sh = jnp.clip(jnp.ceil(bin_h).astype(jnp.int32), 1, S)

    # sample coordinates: y[n, ph, iy] = y1 + (ph + (iy + .5)/n_sh) * bin_h
    ph = jnp.arange(P, dtype=jnp.float32)          # (P,)
    iy = jnp.arange(S, dtype=jnp.float32)          # (S,)

    def coords(start, bin_sz, n_s):
        # (N, P, S)
        frac = (iy[None, None, :] + 0.5) / n_s[:, None, None].astype(jnp.float32)
        return (start[:, None, None]
                + (ph[None, :, None] + frac) * bin_sz[:, None, None])

    ys = coords(y1, bin_h, n_sh)                  # (N, P, S)
    xs = coords(x1, bin_w, n_sw)                  # (N, P, S)
    y_mask = (iy[None, None, :] < n_sh[:, None, None]).astype(jnp.float32)
    x_mask = (iy[None, None, :] < n_sw[:, None, None]).astype(jnp.float32)

    # full sample grid (N, P, S, P, S)
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)

    def per_roi(yy_r, xx_r, ym_r, xm_r):
        vals = _bilinear_gather(feat, yy_r, xx_r)          # (P,S,P,S,C)
        w = (ym_r[:, :, None, None] * xm_r[None, None, :, :])[..., None]
        s = jnp.sum(vals * w, axis=(1, 3))                  # (P,P,C)
        cnt = jnp.sum(ym_r[0]) * jnp.sum(xm_r[0])
        return s / jnp.maximum(cnt, 1.0)

    # chunked over ROIs with lax.map: a flat vmap materializes
    # (N, P, S, P, S, C) gather buffers — ~6 GB at N=1000 per image on the
    # box-head pooler — which blows past HBM.  Sequential chunks bound live
    # memory to chunk_size ROIs while keeping each chunk wide enough to fill
    # the VPU.
    n = boxes.shape[0]
    chunk = min(128, n)
    pad = (-n) % chunk
    if pad:
        pad_spec = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        yy, xx, y_mask, x_mask = map(pad_spec, (yy, xx, y_mask, x_mask))
    reshape = lambda a: a.reshape((-1, chunk) + a.shape[1:])
    out = jax.lax.map(lambda args: jax.vmap(per_roi)(*args),
                      tuple(map(reshape, (yy, xx, y_mask, x_mask))))
    out = out.reshape((-1,) + out.shape[2:])
    return out[:n]


def assign_boxes_to_levels(boxes: jnp.ndarray, min_level: int = 2,
                           max_level: int = 5, canonical_size: float = 224.0,
                           canonical_level: int = 4) -> jnp.ndarray:
    """detectron2 `assign_boxes_to_levels`: (N,4) -> (N,) int level ids."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray, *,
                         strides: Sequence[int], output_size: int,
                         sampling_ratio: int, aligned: bool,
                         min_level: int = 2) -> jnp.ndarray:
    """FPN ROIAlign over levels p2..p5 for one image.

    Args:
      features: list of (H_l, W_l, C) maps ordered fine->coarse.
      boxes: (N, 4) padded boxes.
    Returns:
      (N, P, P, C) pooled features; padded/degenerate ROIs yield zeros.
    """
    levels = assign_boxes_to_levels(boxes, min_level=min_level,
                                    max_level=min_level + len(features) - 1)
    out = None
    for i, feat in enumerate(features):
        pooled = roi_align_level(
            feat, boxes, spatial_scale=1.0 / strides[i],
            output_size=output_size, sampling_ratio=sampling_ratio,
            aligned=aligned)
        sel = (levels == (min_level + i))[:, None, None, None]
        out = jnp.where(sel, pooled, 0.0) if out is None else out + jnp.where(sel, pooled, 0.0)
    return out
