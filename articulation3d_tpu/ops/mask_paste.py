"""Mask pasting (with optional per-pixel mask-NMS) as a fused XLA program.

Re-implements the reference's `paste_masks_in_image` / `_do_paste_mask`
(`layers/mask_ops.py:16-135`), which uses `F.grid_sample(align_corners=False)`
to resample each ROI mask into image space:

  for image pixel center p = i + 0.5, the mask coordinate is
      m = (p - box_lo) / (box_hi - box_lo) * M - 0.5
  sampled bilinearly with zero padding outside the mask.

The `nms` flag reproduces the per-pixel argmax suppression
(`layers/mask_ops.py:126-127`): a pixel keeps only the instance whose *soft*
pasted value is the maximum across all instances (ties keep all, matching
`max != value` in the reference).

No chunking / GPU_MEM_LIMIT machinery: the whole (N, H, W) tensor lives in
HBM and XLA fuses sampling + NMS + threshold into one pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_1d(coord: jnp.ndarray, mask_size: int):
    """grid_sample-style zero-padded bilinear index/weight helper.

    coord: fractional mask-space coordinate (pixel centers at 0..M-1).
    Returns (i0, i1, w0, w1) with zero weights outside the mask support.
    """
    i0 = jnp.floor(coord).astype(jnp.int32)
    i1 = i0 + 1
    w1 = coord - i0.astype(coord.dtype)
    w0 = 1.0 - w1
    in0 = (i0 >= 0) & (i0 < mask_size)
    in1 = (i1 >= 0) & (i1 < mask_size)
    w0 = jnp.where(in0, w0, 0.0)
    w1 = jnp.where(in1, w1, 0.0)
    i0 = jnp.clip(i0, 0, mask_size - 1)
    i1 = jnp.clip(i1, 0, mask_size - 1)
    return i0, i1, w0, w1


def paste_masks(masks: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray,
                image_height: int, image_width: int, *,
                threshold: float = 0.5, nms: bool = False) -> jnp.ndarray:
    """Paste (N, M, M) soft masks into (N, H, W).

    Returns bool masks if `threshold >= 0`, else the soft float masks
    (reference returns uint8*255 for visualization; we keep float).
    Invalid instances come out all-False / all-zero and never win mask-NMS.
    """
    n, m, _ = masks.shape

    y = jnp.arange(image_height, dtype=jnp.float32) + 0.5      # (H,)
    x = jnp.arange(image_width, dtype=jnp.float32) + 0.5       # (W,)

    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # mask coordinate per image pixel: (p - lo) / (hi - lo) * M - 0.5
    h_span = jnp.maximum(y1 - y0, 1e-6)
    w_span = jnp.maximum(x1 - x0, 1e-6)
    my = (y[None, :] - y0[:, None]) / h_span[:, None] * m - 0.5  # (N, H)
    mx = (x[None, :] - x0[:, None]) / w_span[:, None] * m - 0.5  # (N, W)

    yi0, yi1, yw0, yw1 = _sample_1d(my, m)
    xi0, xi1, xw0, xw1 = _sample_1d(mx, m)

    def per_instance(mk, yi0r, yi1r, yw0r, yw1r, xi0r, xi1r, xw0r, xw1r):
        # separable bilinear: rows then cols
        r0 = mk[yi0r]            # (H, M)
        r1 = mk[yi1r]
        rows = r0 * yw0r[:, None] + r1 * yw1r[:, None]   # (H, M)
        c0 = rows[:, xi0r]       # (H, W)
        c1 = rows[:, xi1r]
        return c0 * xw0r[None, :] + c1 * xw1r[None, :]

    soft = jax.vmap(per_instance)(masks, yi0, yi1, yw0, yw1, xi0, xi1, xw0, xw1)
    soft = jnp.where(valid[:, None, None], soft, 0.0)

    if nms:
        # zero pixels where another instance's soft value is strictly higher
        best = jnp.max(soft, axis=0, keepdims=True)
        soft = jnp.where(best != soft, 0.0, soft)

    if threshold >= 0:
        out = soft >= threshold
        return out & valid[:, None, None]
    return soft
