"""Pallas ROIAlign parity vs the XLA formulation (TPU only; skipped on CPU).

The same comparison runs on real hardware via `tools/drive_pallas.py`, which
is part of the bench/verify flow.
"""

import numpy as np
import pytest

import jax


requires_tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                                  reason="pallas kernel needs a TPU")


@requires_tpu
@pytest.mark.parametrize("sr,aligned,p", [(0, True, 7), (0, False, 14),
                                          (2, False, 14)])
def test_pallas_matches_xla(sr, aligned, p):
    import jax.numpy as jnp
    from articulation3d_tpu.ops.roi_align import multilevel_roi_align
    from articulation3d_tpu.ops.roi_align_pallas import \
        multilevel_roi_align_pallas

    rs = np.random.RandomState(0)
    B, N = 2, 64
    feats = [jnp.asarray(rs.randn(B, h, w, 256), jnp.float32)
             for h, w in [(120, 160), (60, 80), (30, 40), (15, 20)]]
    sizes = rs.uniform(20, 500, (B, N, 1))
    x1 = rs.uniform(0, 600, (B, N, 1))
    y1 = rs.uniform(0, 440, (B, N, 1))
    boxes = jnp.asarray(np.concatenate(
        [x1, y1, np.minimum(x1 + sizes, 640),
         np.minimum(y1 + sizes * 0.8, 480)], axis=2).astype(np.float32))

    ref = jax.vmap(lambda f2, f3, f4, f5, b: multilevel_roi_align(
        [f2, f3, f4, f5], b, strides=(4, 8, 16, 32), output_size=p,
        sampling_ratio=sr, aligned=aligned))(*feats, boxes)
    got = multilevel_roi_align_pallas(
        feats, boxes, strides=(4, 8, 16, 32), output_size=p,
        sampling_ratio=sr, aligned=aligned)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
