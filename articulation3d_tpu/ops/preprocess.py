"""Fused image preprocessing: resize -> normalize -> pad, all on device.

Replaces the reference's host-side `cv2.resize` + Caffe-style BGR mean
subtraction + divisibility padding scattered across
`tools/inference.py:216-218`, `modeling/meta_arch/planercnn.py:188-196` and
`data/planercnn_transforms.py:317`.  Here the whole thing is one jitted
function over a *batch* of frames (frames are the batch axis on TPU), so
video preprocessing rides the VPU instead of OpenCV.

Normalization: pixel_mean (103.53, 116.28, 123.675) BGR, std 1.0
(`config/config.yaml:90-97`); images flow through in BGR channel order to
match ported Caffe-style weights.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """cv2.resize(INTER_LINEAR)-compatible bilinear resize (half-pixel centers).

    img: (H, W, C) or (B, H, W, C).
    """
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    b, h, w, c = img.shape

    def axis_coords(out_n, in_n):
        scale = in_n / out_n
        coords = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * scale - 0.5
        i0 = jnp.floor(coords).astype(jnp.int32)
        frac = coords - i0.astype(jnp.float32)
        i0c = jnp.clip(i0, 0, in_n - 1)
        i1c = jnp.clip(i0 + 1, 0, in_n - 1)
        return i0c, i1c, frac

    y0, y1, fy = axis_coords(height, h)
    x0, x1, fx = axis_coords(width, w)

    top = img[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + \
          img[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = img[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + \
          img[:, y1][:, :, x1] * fx[None, None, :, None]
    out = top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]
    return out if batched else out[0]


def sem_seg_postprocess(result: jnp.ndarray, img_size: Tuple[int, int],
                        output_height: int, output_width: int) -> jnp.ndarray:
    """Semantic-segmentation logits (C, H, W) -> (C, out_h, out_w).

    Equivalent of the reference's `sem_seg_postprocess`
    (articulation3d/modeling/postprocessing.py:77-98): crop off the
    size-divisibility padding to `img_size`, then bilinear-resize to the
    original resolution (half-pixel centers == `F.interpolate(...,
    align_corners=False)`).  Unused by the PlaneRCNN flow — provided for
    API completeness.
    """
    cropped = result[:, :img_size[0], :img_size[1]]
    out = resize_bilinear(jnp.transpose(cropped, (1, 2, 0)).astype(jnp.float32),
                          output_height, output_width)
    return jnp.transpose(out, (2, 0, 1))


@partial(jax.jit, static_argnames=("height", "width", "size_divisibility"))
def preprocess_images(images: jnp.ndarray,
                      pixel_mean: Tuple[float, float, float] = (103.53, 116.28, 123.675),
                      pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                      *, height: int = 480, width: int = 640,
                      size_divisibility: int = 32) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float BGR frames -> normalized padded (B, H', W', 3)."""
    x = images.astype(jnp.float32)
    if x.shape[1] != height or x.shape[2] != width:
        x = resize_bilinear(x, height, width)
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    x = (x - mean) / std
    d = size_divisibility
    ph = (d - height % d) % d
    pw = (d - width % d) % d
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x
