"""Axis codec: 2D line segment <-> (sin, cos, offset) about a box center.

Vectorized numpy re-implementation of the reference codec
(`articulation3d/articulation3d/data/planercnn_transforms.py:31-176`):

* ``axis_to_angle_offset``: segment [x1,y1,x2,y2] (image pixels) -> line
  parameters about ``center``: x·cos + y·sin = p with p = |C|/|(A,B)| / 100
  (the reference's offset scale, with its stale "800 = diag" comment —
  `planercnn_transforms.py:61`), direction signed by sign(C).  The torch
  quirk sign(0) = 0 (center exactly on the line -> sin = cos = 0) is
  preserved.
* ``angle_offset_to_axis``: inverse via boundary-point intersection with the
  image rectangle, truncating to int like the reference
  (`planercnn_transforms.py:101-176`), including the fallback [0,0,1,1] for
  degenerate axes.

These run host-side in the data pipeline and the temporal optimizer's axis
re-encoding; a jnp twin of the forward codec is provided for in-jit use.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def axis_to_angle_offset(axis: np.ndarray, centers: np.ndarray,
                         valid: Optional[np.ndarray] = None) -> np.ndarray:
    """Encode line segments as (sin, cos, offset, valid).

    Args:
      axis: (N, 4) [x1, y1, x2, y2] in absolute pixels.  Rows with
        ``valid == 0`` are replaced by the reference's placeholder [0,0,1,1].
      centers: (N, 2) box centers (cx, cy).
      valid: optional (N,) mask; defaults to all valid (the reference encodes
        None annotations as placeholder rows with valid bit 0).
    Returns:
      (N, 4) float32 [sin, cos, offset, valid].
    """
    axis = np.asarray(axis, np.float64).reshape(-1, 4).copy()
    centers = np.asarray(centers, np.float64).reshape(-1, 2)
    if valid is None:
        valid = np.ones(axis.shape[0], bool)
    else:
        valid = np.asarray(valid, bool).reshape(-1)
    axis[~valid] = (0.0, 0.0, 1.0, 1.0)

    rel = axis - np.concatenate([centers, centers], axis=1)
    x1, y1, x2, y2 = rel[:, 0], rel[:, 1], rel[:, 2], rel[:, 3]
    a = y1 - y2
    b = x2 - x1
    c = x1 * y2 - x2 * y1
    norm = np.sqrt(a * a + b * b)
    # degenerate segments (p1 == p2) produce nan in the reference; guard the
    # division but keep the nan-for-degenerate contract out of valid rows
    norm = np.where(norm == 0, np.nan, norm)
    offset = np.abs(c) / norm / 100.0
    sgn = np.sign(c)  # torch.sign(0) == 0 — preserved
    cos = -a * sgn / norm
    sin = -b * sgn / norm
    out = np.stack([sin, cos, offset, valid.astype(np.float64)], axis=1)
    return out.astype(np.float32)


def axis_to_angle_offset_jnp(axis: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """jnp twin of `axis_to_angle_offset` (all rows treated valid)."""
    rel = axis - jnp.concatenate([centers, centers], axis=-1)
    x1, y1, x2, y2 = rel[..., 0], rel[..., 1], rel[..., 2], rel[..., 3]
    a = y1 - y2
    b = x2 - x1
    c = x1 * y2 - x2 * y1
    norm = jnp.sqrt(a * a + b * b)
    safe = jnp.where(norm == 0, 1.0, norm)
    offset = jnp.abs(c) / safe / 100.0
    sgn = jnp.sign(c)
    cos = -a * sgn / safe
    sin = -b * sgn / safe
    valid = (norm > 0).astype(jnp.float32)
    return jnp.stack([sin, cos, offset, valid], axis=-1)


def get_boundary_point(y: float, x: float, angle: float, H: int, W: int
                       ) -> Tuple[Optional[Tuple[int, int]], Optional[Tuple[int, int]]]:
    """Intersect the line through (x, y) at ``angle`` with the image border.

    Port of the reference's branch cascade (`planercnn_transforms.py:133-176`)
    with identical int truncation and first-two-hits semantics.
    """
    point1 = None
    point2 = None
    if angle == -np.pi / 2:
        point1 = (x, 0)
        point2 = (x, H - 1)
    elif angle == 0.0:
        point1 = (0, y)
        point2 = (W - 1, y)
    else:
        k = np.tan(angle)
        if 0 <= y - k * x < H:  # left border
            if point1 is None:
                point1 = (0, int(y - k * x))
            elif point2 is None:
                point2 = (0, int(y - k * x))
                if point2 == point1:
                    point2 = None
        if 0 <= k * (W - 1) + y - k * x < H:  # right border
            if point1 is None:
                point1 = (W - 1, int(k * (W - 1) + y - k * x))
            elif point2 is None:
                point2 = (W - 1, int(k * (W - 1) + y - k * x))
                if point2 == point1:
                    point2 = None
        if 0 <= x - y / k < W:  # top border
            if point1 is None:
                point1 = (int(x - y / k), 0)
            elif point2 is None:
                point2 = (int(x - y / k), 0)
                if point2 == point1:
                    point2 = None
        if 0 <= x - y / k + (H - 1) / k < W:  # bottom border
            if point1 is None:
                point1 = (int(x - y / k + (H - 1) / k), H - 1)
            elif point2 is None:
                point2 = (int(x - y / k + (H - 1) / k), H - 1)
                if point2 == point1:
                    point2 = None
        if point2 is None:
            point2 = point1
    return point1, point2


def angle_offset_to_axis(angle_offsets: np.ndarray, centers: np.ndarray,
                         H: int = 480, W: int = 640) -> np.ndarray:
    """Decode (sin, cos, offset) rows back to boundary-clipped segments.

    Returns (N, 4) int64 [x1, y1, x2, y2] — the reference's `.long()` output
    (`planercnn_transforms.py:101-131`), with the [0,0,1,1] fallback when no
    boundary intersection exists.
    """
    angle_offsets = np.asarray(angle_offsets, np.float64).reshape(-1, 3)
    centers = np.asarray(centers, np.float64).reshape(-1, 2)
    out = []
    for (sin, cos, p), (x0, y0) in zip(angle_offsets, centers):
        p = p * 100.0
        if sin == 0:
            angle = -np.pi / 2
        else:
            angle = -np.arctan(cos / sin)
        x, y = p * cos + x0, p * sin + y0
        p1, p2 = get_boundary_point(y, x, angle, H, W)
        if p1 is None or p2 is None:
            out.append([0, 0, 1, 1])
        else:
            out.append([p1[0], p1[1], p2[0], p2[1]])
    return np.asarray(out, np.int64)
