"""GT-mask crop (`train.targets.crop_gt_masks`) parity.

The round-4 TPU formulation (separable MXU matmuls against the G-mask
stack) must reproduce the gather formulation it replaced — d2
`BitMasks.crop_and_resize` == per-ROI aligned ROIAlign (sampling_ratio 2)
on the matched full-resolution bitmask, thresholded at 0.5.
"""

import numpy as np
import jax
import jax.numpy as jnp

from articulation3d_tpu.ops.roi_align import roi_align_level
from articulation3d_tpu.train.targets import crop_gt_masks


def _reference_crop(gt_masks, matched_idx, boxes, mask_size):
    """The r3 gather formulation (per-ROI ROIAlign on the matched mask)."""
    src = gt_masks[matched_idx]          # (S, H, W)

    def per_roi(m, b):
        pooled = roi_align_level(m[:, :, None], b[None], spatial_scale=1.0,
                                 output_size=mask_size, sampling_ratio=2,
                                 aligned=True)
        return pooled[0, :, :, 0]

    crops = jax.vmap(per_roi)(src, boxes)
    return (crops >= 0.5).astype(jnp.float32)


def test_crop_gt_masks_matches_gather_formulation():
    rs = np.random.RandomState(0)
    g, h, w = 5, 96, 128
    # structured binary masks (rectangles + noise blobs), not pure noise —
    # pure noise pools to ~0.5 everywhere, exactly where fp-rounding
    # differences between formulations could flip the threshold
    masks = np.zeros((g, h, w), np.float32)
    for i in range(g):
        y0, x0 = rs.randint(0, h // 2), rs.randint(0, w // 2)
        masks[i, y0:y0 + rs.randint(10, h // 2),
              x0:x0 + rs.randint(10, w // 2)] = 1.0
    masks[rs.rand(g, h, w) < 0.02] = 1.0

    n = 33  # not a multiple of the chunk size: exercises padding
    x1 = rs.uniform(0, w * 0.7, n)
    y1 = rs.uniform(0, h * 0.7, n)
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rs.uniform(4, w * 0.3, n),
         y1 + rs.uniform(4, h * 0.3, n)], -1), jnp.float32)
    # include a degenerate (empty) and an out-of-bounds box
    boxes = boxes.at[0].set(jnp.asarray([10.0, 10.0, 10.0, 10.0]))
    boxes = boxes.at[1].set(jnp.asarray([-20.0, -20.0, 5.0, 5.0]))
    midx = jnp.asarray(rs.randint(0, g, n), jnp.int32)

    got = crop_gt_masks(jnp.asarray(masks), midx, boxes, 28, chunk=16)
    ref = _reference_crop(jnp.asarray(masks), midx, boxes, 28)
    mismatch = float(jnp.mean(jnp.abs(got - ref)))
    # identical math, different accumulation order: pooled values sitting
    # EXACTLY at the 0.5 threshold may flip; anything beyond a stray pixel
    # means the formulations diverged
    assert mismatch < 1e-3, mismatch
    assert got.shape == (n, 28, 28)
    # and under jit + vmap (the detection_losses call pattern)
    got_jit = jax.jit(lambda m, i, b: crop_gt_masks(m, i, b, 28))(
        jnp.asarray(masks), midx, boxes)
    np.testing.assert_array_equal(np.asarray(got_jit), np.asarray(got))
