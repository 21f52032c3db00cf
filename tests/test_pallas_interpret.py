"""The ACTUAL Pallas kernels (grid logic, predication, scalar prefetch,
scratch accumulation, DMA flush) run on CPU via pallas interpret mode and
must match the XLA formulations.

`tests/test_pallas_roi.py` hand-emulates the kernels' separable MATH; this
module executes the kernel CODE itself, so regressions in the pallas
plumbing (BlockSpec index maps, group padding, image-boundary flush,
level/valid predication) are caught in CI without a TPU.  On-chip parity of
the compiled kernels is separately gated by bench.py and
tools/drive_{pallas,adjoint}.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from articulation3d_tpu.ops.roi_align import (multilevel_roi_align,
                                              multilevel_roi_align_adjoint)
from articulation3d_tpu.ops.roi_align_pallas import (
    multilevel_roi_align_adjoint_pallas, multilevel_roi_align_pallas,
    pallas_level_idx)

STRIDES = (4, 8, 16, 32)


def _pyramid(rs, b=2, c=8):
    return [jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
            for h, w in [(64, 80), (32, 40), (16, 20), (8, 16)]]


def _boxes(rs, b=2, n=6):
    x1 = rs.uniform(0, 200, (b, n, 1))
    y1 = rs.uniform(0, 150, (b, n, 1))
    sz = rs.uniform(10, 100, (b, n, 1))
    return jnp.asarray(np.concatenate(
        [x1, y1, np.minimum(x1 + sz, 320), np.minimum(y1 + sz * 0.8, 256)],
        axis=2), jnp.float32)


def test_forward_kernel_interpret_matches_xla():
    rs = np.random.RandomState(0)
    feats = _pyramid(rs)
    boxes = _boxes(rs)
    got = multilevel_roi_align_pallas(
        feats, boxes, strides=STRIDES, output_size=7, sampling_ratio=0,
        aligned=True, interpret=True)
    want = jax.vmap(lambda f2, f3, f4, f5, b: multilevel_roi_align(
        [f2, f3, f4, f5], b, strides=STRIDES, output_size=7,
        sampling_ratio=0, aligned=True))(*feats, boxes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_kernel_interpret_valid_predication():
    rs = np.random.RandomState(1)
    feats = _pyramid(rs, b=1)
    boxes = _boxes(rs, b=1, n=4)
    valid = jnp.asarray([[True, False, True, False]])
    got = multilevel_roi_align_pallas(
        feats, boxes, strides=STRIDES, output_size=7, sampling_ratio=0,
        aligned=True, valid=valid, interpret=True)
    assert float(jnp.abs(got[0, 1]).max()) == 0.0
    assert float(jnp.abs(got[0, 3]).max()) == 0.0
    assert float(jnp.abs(got[0, 0]).max()) > 0.0


@pytest.mark.parametrize("p", [7, 14])
def test_adjoint_kernel_interpret_matches_xla(p):
    rs = np.random.RandomState(2)
    feats = _pyramid(rs)
    shapes = [f.shape for f in feats]
    boxes = _boxes(rs)
    g = jnp.asarray(rs.randn(2, 6, p, p, 8), jnp.float32)
    got = multilevel_roi_align_adjoint_pallas(
        g, boxes, shapes, strides=STRIDES, output_size=p, sampling_ratio=0,
        aligned=True, interpret=True)
    lvl = pallas_level_idx(boxes.reshape(-1, 4), n_levels=4, strides=STRIDES,
                           output_size=p, sampling_ratio=0,
                           aligned=True).reshape(2, 6)
    per_shapes = [s[1:] for s in shapes]
    want = jax.vmap(lambda gi, bi, li: multilevel_roi_align_adjoint(
        gi, bi, per_shapes, strides=STRIDES, output_size=p, sampling_ratio=0,
        aligned=True, chunk=32, level_idx=li))(g, boxes, lvl)
    for ga, gw in zip(got, want):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw),
                                   rtol=1e-4, atol=1e-4)


def test_adjoint_kernel_interpret_group_padding():
    """n not a multiple of ADJ_GROUP exercises the per-image pad path
    (dummy ROIs must contribute nothing)."""
    rs = np.random.RandomState(3)
    feats = _pyramid(rs, b=2)
    shapes = [f.shape for f in feats]
    boxes = _boxes(rs, b=2, n=3)          # 3 % ADJ_GROUP(8) != 0
    g = jnp.asarray(rs.randn(2, 3, 7, 7, 8), jnp.float32)
    got = multilevel_roi_align_adjoint_pallas(
        g, boxes, shapes, strides=STRIDES, output_size=7, sampling_ratio=0,
        aligned=True, interpret=True)
    lvl = pallas_level_idx(boxes.reshape(-1, 4), n_levels=4, strides=STRIDES,
                           output_size=7, sampling_ratio=0,
                           aligned=True).reshape(2, 3)
    per_shapes = [s[1:] for s in shapes]
    want = jax.vmap(lambda gi, bi, li: multilevel_roi_align_adjoint(
        gi, bi, per_shapes, strides=STRIDES, output_size=7, sampling_ratio=0,
        aligned=True, chunk=32, level_idx=li))(g, boxes, lvl)
    for ga, gw in zip(got, want):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw),
                                   rtol=1e-4, atol=1e-4)
