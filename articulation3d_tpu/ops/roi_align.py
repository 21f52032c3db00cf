"""ROIAlign for TPU as flat row-gathers over a concatenated FPN pyramid.

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

TPU-native formulation (this is the hottest op in the model):

  * every feature map is flattened to (H*W, C) rows and all levels are
    CONCATENATED into one (sum HW, C) buffer, so each ROI samples exactly
    once — at its assigned level — through per-sample flat indices with a
    per-ROI level offset.  (A per-level pool + select computes 4x the work
    and 2D (y, x)-indexed gathers lower to slow generic scatter/gather; flat
    row gathers with a 256-wide innermost dim ride HBM bandwidth.)
  * the 4 bilinear corners become one gather of shape (points, 4) -> rows,
    combined with the bilinear weights in a single fused pass;
  * out-of-range samples index a zero row appended at the end of the buffer
    (no masking pass);
  * ROIs are processed in `lax.map` chunks to bound live gather buffers
    (a flat vmap at 1000 proposals x 784 samples x 256ch OOMs HBM).

Everything is batched: boxes are fixed-capacity padded arrays, invalid ROIs
produce zeros.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_coords(boxes: jnp.ndarray, spatial_scale, output_size: int,
                   sampling_ratio: int, aligned: bool, adaptive_cap: int
                   ) -> Tuple[jnp.ndarray, ...]:
    """Per-ROI sample coordinates and masks.

    spatial_scale may be a scalar or a per-ROI (N,) array (multilevel).
    Returns ys, xs (N, P, S) float coords plus y_mask, x_mask (N, P, S).
    """
    P = output_size
    scale = jnp.asarray(spatial_scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.broadcast_to(scale, boxes.shape[:1])
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * scale - offset
    y1 = boxes[:, 1] * scale - offset
    x2 = boxes[:, 2] * scale - offset
    y2 = boxes[:, 3] * scale - offset

    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy: force malformed ROIs to be 1x1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / P
    bin_h = roi_h / P

    if sampling_ratio > 0:
        S = sampling_ratio
        n_sw = jnp.full(boxes.shape[:1], S, jnp.int32)
        n_sh = jnp.full(boxes.shape[:1], S, jnp.int32)
    else:
        S = adaptive_cap
        n_sw = jnp.clip(jnp.ceil(bin_w).astype(jnp.int32), 1, S)
        n_sh = jnp.clip(jnp.ceil(bin_h).astype(jnp.int32), 1, S)

    ph = jnp.arange(P, dtype=jnp.float32)
    iy = jnp.arange(S, dtype=jnp.float32)

    def coords(start, bin_sz, n_s):
        frac = (iy[None, None, :] + 0.5) / n_s[:, None, None].astype(jnp.float32)
        return (start[:, None, None]
                + (ph[None, :, None] + frac) * bin_sz[:, None, None])

    ys = coords(y1, bin_h, n_sh)                  # (N, P, S)
    xs = coords(x1, bin_w, n_sw)
    y_mask = (iy[None, None, :] < n_sh[:, None, None]).astype(jnp.float32)
    x_mask = (iy[None, None, :] < n_sw[:, None, None]).astype(jnp.float32)
    return ys, xs, y_mask, x_mask


def _corner_indices_weights(ys, xs, heights, widths, row_offsets, row_stride):
    """Bilinear corner flat indices + weights for mixed-level sampling.

    ys, xs: (N, P, S); heights/widths/row_offsets: per-ROI (N,) int.
    Returns idx (N, P, S, P, S, 4) int32 into the flat row buffer (the last
    row is the zero row), and w (N, P, S, P, S, 4) float32.
    """
    H = heights[:, None, None].astype(jnp.float32)
    W = widths[:, None, None].astype(jnp.float32)
    Hi = heights[:, None, None]
    Wi = widths[:, None, None]

    oor_y = (ys < -1.0) | (ys > H)
    oor_x = (xs < -1.0) | (xs > W)
    y = jnp.clip(ys, 0.0, None)
    x = jnp.clip(xs, 0.0, None)

    y_low = jnp.minimum(y.astype(jnp.int32), Hi - 1)
    x_low = jnp.minimum(x.astype(jnp.int32), Wi - 1)
    y_high = jnp.minimum(y_low + 1, Hi - 1)
    x_high = jnp.minimum(x_low + 1, Wi - 1)
    y = jnp.where(y.astype(jnp.int32) >= Hi - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x.astype(jnp.int32) >= Wi - 1, x_low.astype(x.dtype), x)

    ly = y - y_low.astype(y.dtype)
    lx = x - x_low.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    # broadcast y samples against x samples: (N, P, S, P, S)
    def by(a):  # y-like (N, P, S) -> (N, P, S, 1, 1)
        return a[:, :, :, None, None]

    def bx(a):  # x-like (N, P, S) -> (N, 1, 1, P, S)
        return a[:, None, None, :, :]

    off = row_offsets[:, None, None, None, None]
    stride = row_stride[:, None, None, None, None]
    oor = by(oor_y) | bx(oor_x)

    i1 = off + by(y_low) * stride + bx(x_low)
    i2 = off + by(y_low) * stride + bx(x_high)
    i3 = off + by(y_high) * stride + bx(x_low)
    i4 = off + by(y_high) * stride + bx(x_high)
    idx = jnp.stack([i1, i2, i3, i4], axis=-1)

    w1 = by(hy) * bx(hx)
    w2 = by(hy) * bx(lx)
    w3 = by(ly) * bx(hx)
    w4 = by(ly) * bx(lx)
    w = jnp.stack([w1, w2, w3, w4], axis=-1)
    w = jnp.where(oor[..., None], 0.0, w)
    return idx, w


def _gather_pool(flat_rows: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                 y_mask: jnp.ndarray, x_mask: jnp.ndarray,
                 chunk: int = 128) -> jnp.ndarray:
    """Gather corner rows, bilinear-combine, average bins (chunked).

    flat_rows: (R+1, C) with a zero row last; idx/w: (N, P, S, P, S, 4);
    masks (N, P, S).  Returns (N, P, P, C).
    """
    n = idx.shape[0]
    P, S = idx.shape[1], idx.shape[2]
    c = flat_rows.shape[1]
    # never pad a small ROI set up to a full chunk: the per-chunk gather
    # buffer is (chunk, P, S, P, S, C) regardless of real occupancy, so a
    # 16-ROI training pool padded to 128 costs 8x the memory and traffic
    # (floor of 1 keeps n == 0 valid: one empty lax.map chunk)
    chunk = max(1, min(chunk, n))

    def chunk_fn(args):
        idx_c, w_c, ym_c, xm_c = args                  # (K, P,S,P,S,4), ...
        k = idx_c.shape[0]
        sw = ym_c[:, :, :, None, None] * xm_c[:, None, None, :, :]
        # accumulate corner-by-corner: keeps the live gather buffer at
        # (K, P, S, P, S, C) instead of stacking a 4x corner axis
        pooled = jnp.zeros((k, P, P, c), jnp.float32)
        for corner in range(4):
            rows = flat_rows[idx_c[..., corner].reshape(-1)]
            rows = rows.reshape(k, P, S, P, S, c).astype(jnp.float32)
            wgt = (w_c[..., corner] * sw)[..., None]
            pooled = pooled + jnp.sum(rows * wgt, axis=(2, 4))
        cnt = (jnp.sum(ym_c[:, 0, :], axis=1)
               * jnp.sum(xm_c[:, 0, :], axis=1))               # (K,)
        return pooled / jnp.maximum(cnt, 1.0)[:, None, None, None]

    pad = (-n) % chunk
    if pad:
        padf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        idx, w, y_mask, x_mask = map(padf, (idx, w, y_mask, x_mask))
    resh = lambda a: a.reshape((-1, chunk) + a.shape[1:])
    out = jax.lax.map(chunk_fn, tuple(map(resh, (idx, w, y_mask, x_mask))))
    return out.reshape((-1, P, P, c))[:n]


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
    h, w, c = feat.shape
    n = boxes.shape[0]
    flat = jnp.concatenate([feat.reshape(h * w, c),
                            jnp.zeros((1, c), feat.dtype)], axis=0)
    ys, xs, y_mask, x_mask = _sample_coords(
        boxes, spatial_scale, output_size, sampling_ratio, aligned,
        adaptive_cap)
    heights = jnp.full((n,), h, jnp.int32)
    widths = jnp.full((n,), w, jnp.int32)
    offsets = jnp.zeros((n,), jnp.int32)
    idx, wgt = _corner_indices_weights(ys, xs, heights, widths, offsets,
                                       widths)
    # out-of-range corners carry weight 0; point them at the zero row anyway
    idx = jnp.where(wgt > 0, idx, h * w)
    idx = jnp.clip(idx, 0, h * w)
    return _gather_pool(flat, idx, wgt, y_mask, x_mask).astype(feat.dtype)


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
                         min_level: int = 2, chunk: int = 128,
                         level_idx: jnp.ndarray | None = None) -> jnp.ndarray:
    """FPN ROIAlign over levels p2..p5 for one image.

    Each ROI is sampled ONCE, at its assigned level, via flat indices into
    the concatenated level pyramid.

    Args:
      features: list of (H_l, W_l, C) maps ordered fine->coarse.
      boxes: (N, 4) padded boxes.
      level_idx: optional (N,) 0-based level override (default: detectron2's
        sqrt-area assignment).  Used to force the Pallas kernel's
        overflow-bumped levels so forward/adjoint pairs stay in lockstep.
    Returns:
      (N, P, P, C) pooled features; padded/degenerate ROIs yield zeros.
    """
    c = features[0].shape[-1]
    n = boxes.shape[0]
    if level_idx is None:
        levels = assign_boxes_to_levels(boxes, min_level=min_level,
                                        max_level=min_level + len(features) - 1)
        lvl_idx = levels - min_level                               # (N,)
    else:
        lvl_idx = level_idx

    hs = np.array([f.shape[0] for f in features], np.int32)
    ws = np.array([f.shape[1] for f in features], np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws)])
    total = int(offs[-1])
    flat = jnp.concatenate(
        [f.reshape(-1, c) for f in features] + [jnp.zeros((1, c), features[0].dtype)],
        axis=0)                                                    # (total+1, C)

    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl_idx]
    heights = jnp.asarray(hs)[lvl_idx]
    widths = jnp.asarray(ws)[lvl_idx]
    row_offsets = jnp.asarray(offs[:-1], jnp.int32)[lvl_idx]

    ys, xs, y_mask, x_mask = _sample_coords(
        boxes, scales, output_size, sampling_ratio, aligned, adaptive_cap=4)
    idx, wgt = _corner_indices_weights(ys, xs, heights, widths, row_offsets,
                                       widths)
    idx = jnp.where(wgt > 0, idx, total)
    idx = jnp.clip(idx, 0, total)
    return _gather_pool(flat, idx, wgt, y_mask, x_mask,
                        chunk=chunk).astype(features[0].dtype)


def multilevel_roi_align_adjoint(g: jnp.ndarray, boxes: jnp.ndarray,
                                 feat_shapes: Sequence[Tuple[int, int, int]],
                                 *, strides: Sequence[int], output_size: int,
                                 sampling_ratio: int, aligned: bool,
                                 min_level: int = 2, chunk: int = 32,
                                 level_idx: jnp.ndarray | None = None):
    """Adjoint of `multilevel_roi_align` w.r.t. the FEATURES, one image.

    The forward is linear in the features for fixed boxes:
        pooled[n,q,p,c] = sum_s flat[idx[n,q,p,s], c] * w[n,q,p,s] / cnt[n]
    so the adjoint is the corresponding scatter-add — exactly what
    torchvision's CUDA `roi_align` backward computes (atomicAdd of the four
    corner weights per sample).  It is hand-written (rather than
    `jax.linear_transpose` of the forward) because transposing through the
    forward's `lax.map` chunking trips JAX's scan-transpose on captured
    linear constants; this recomputes the SAME indices/weights via the
    shared helpers, so the two stay in lockstep by construction
    (tests/test_roi_train_pool.py asserts gradient parity vs autodiff).

    Args:
      g: (N, P, P, C) cotangent of the pooled output.
      boxes: (N, 4) the same boxes the forward pooled.
      feat_shapes: per-level (H_l, W_l, C).
      level_idx: optional (N,) 0-based level override so the scatter targets
        the SAME level the (Pallas) forward read — see
        `roi_align_pallas.pallas_level_idx`.
    Returns list of per-level (H_l, W_l, C) float32 feature gradients.
    """
    c = feat_shapes[0][-1]
    n = boxes.shape[0]
    P = output_size
    if level_idx is None:
        levels = assign_boxes_to_levels(
            boxes, min_level=min_level,
            max_level=min_level + len(feat_shapes) - 1)
        lvl_idx = levels - min_level
    else:
        lvl_idx = level_idx
    hs = np.array([s[0] for s in feat_shapes], np.int32)
    ws = np.array([s[1] for s in feat_shapes], np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws)])
    total = int(offs[-1])

    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl_idx]
    heights = jnp.asarray(hs)[lvl_idx]
    widths = jnp.asarray(ws)[lvl_idx]
    row_offsets = jnp.asarray(offs[:-1], jnp.int32)[lvl_idx]

    ys, xs, y_mask, x_mask = _sample_coords(
        boxes, scales, output_size, sampling_ratio, aligned, adaptive_cap=4)
    idx, wgt = _corner_indices_weights(ys, xs, heights, widths, row_offsets,
                                       widths)
    idx = jnp.where(wgt > 0, idx, total)
    idx = jnp.clip(idx, 0, total)           # the dummy row soaks up OOR mass

    chunk = max(1, min(chunk, n))
    S = idx.shape[2]

    def chunk_fn(dflat, args):
        idx_c, w_c, ym_c, xm_c, g_c = args
        sw = ym_c[:, :, :, None, None] * xm_c[:, None, None, :, :]
        cnt = (jnp.sum(ym_c[:, 0, :], axis=1)
               * jnp.sum(xm_c[:, 0, :], axis=1))
        gn = (g_c.astype(jnp.float32)
              / jnp.maximum(cnt, 1.0)[:, None, None, None])     # (K,P,P,C)
        gexp = gn[:, :, None, :, None, :]                       # (K,P,1,P,1,C)
        # corner-by-corner, mirroring `_gather_pool`'s accumulation: keeps
        # the live update buffer at (K, P, S, P, S, C)
        for corner in range(4):
            upd = (w_c[..., corner] * sw)[..., None] * gexp
            dflat = dflat.at[idx_c[..., corner].reshape(-1)].add(
                upd.reshape(-1, c))
        return dflat, None

    pad = (-n) % chunk
    g = g.astype(jnp.float32)
    if pad:
        padf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        idx, wgt, y_mask, x_mask, g = map(padf, (idx, wgt, y_mask, x_mask, g))
    resh = lambda a: a.reshape((-1, chunk) + a.shape[1:])
    dflat, _ = jax.lax.scan(
        chunk_fn, jnp.zeros((total + 1, c), jnp.float32),
        tuple(map(resh, (idx, wgt, y_mask, x_mask, g))))
    return [dflat[int(offs[l]):int(offs[l + 1])].reshape(int(hs[l]),
                                                         int(ws[l]), c)
            for l in range(len(feat_shapes))]
