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
    # n=5: odd ROI count exercises the dummy zero-tile group-padding path
    # (f32 GROUP=2 -> total 10 per image is padded from 5x2)
    boxes = _boxes(rs, n=5)
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


@pytest.mark.parametrize("p", [7])   # p=7 covers all kernel plumbing; the
def test_adjoint_kernel_interpret_matches_xla(p):   # interpreter is slow
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


def test_train_pool_grad_interpret_end_to_end():
    """`jax.grad` through `multilevel_roi_align_train` with the REAL Pallas
    forward + Pallas adjoint (interpret mode) equals plain autodiff of the
    XLA formulation — the exact fwd/bwd pair training calls on TPU,
    including the custom_vjp wiring, valid-mask threading and dtype casts."""
    from articulation3d_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_train)

    rs = np.random.RandomState(4)
    feats = _pyramid(rs, b=1)
    boxes = _boxes(rs, b=1, n=5)
    valid = jnp.asarray([[True, True, False, True, True]])
    cot = jnp.asarray(rs.randn(1, 5, 7, 7, 8), jnp.float32)

    def pallas_loss(fs):
        out = multilevel_roi_align_train(
            fs, boxes, strides=STRIDES, output_size=7, sampling_ratio=0,
            aligned=True, use_pallas=True, interpret=True, valid=valid)
        return jnp.sum(out * cot)

    def xla_loss(fs):
        def per_image(f, bx):
            return multilevel_roi_align(
                list(f), bx, strides=STRIDES, output_size=7,
                sampling_ratio=0, aligned=True, chunk=32)
        out = jax.vmap(per_image)(tuple(fs), boxes)
        out = jnp.where(valid[..., None, None, None], out, 0.0)
        return jnp.sum(out * cot)

    v_p, g_p = jax.value_and_grad(pallas_loss)(tuple(feats))
    v_x, g_x = jax.value_and_grad(xla_loss)(tuple(feats))
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    for gp, gx in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow   # ~33s of interpreter time for an edge path
def test_kernel_recursion_paths_interpret(monkeypatch):
    """The MAX_ROIS_PER_LAUNCH recursion branches (image-chunk and
    single-image ROI-chunk, forward AND adjoint) with the cap shrunk so
    tiny shapes trigger them; the adjoint's ROI-axis chunks must SUM."""
    import articulation3d_tpu.ops.roi_align_pallas as rap

    monkeypatch.setattr(rap, "MAX_ROIS_PER_LAUNCH", 4)
    rs = np.random.RandomState(5)
    feats = _pyramid(rs, b=2)
    shapes = [f.shape for f in feats]
    boxes = _boxes(rs, b=2, n=6)          # 2x6 > 4 -> image chunking
    got = rap.multilevel_roi_align_pallas(
        feats, boxes, strides=STRIDES, output_size=7, sampling_ratio=0,
        aligned=True, interpret=True)
    want = jax.vmap(lambda f2, f3, f4, f5, b: multilevel_roi_align(
        [f2, f3, f4, f5], b, strides=STRIDES, output_size=7,
        sampling_ratio=0, aligned=True))(*feats, boxes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # single image, 6 ROIs > cap 4 -> ROI-axis chunking (adjoint must ADD
    # the per-chunk gradients, not concatenate)
    boxes1, g1 = boxes[:1], jnp.asarray(rs.randn(1, 6, 7, 7, 8), jnp.float32)
    shapes1 = [(1,) + s[1:] for s in shapes]
    got_g = rap.multilevel_roi_align_adjoint_pallas(
        g1, boxes1, shapes1, strides=STRIDES, output_size=7,
        sampling_ratio=0, aligned=True, interpret=True)
    lvl = pallas_level_idx(boxes1.reshape(-1, 4), n_levels=4,
                           strides=STRIDES, output_size=7, sampling_ratio=0,
                           aligned=True).reshape(1, 6)
    per_shapes = [s[1:] for s in shapes]
    want_g = jax.vmap(lambda gi, bi, li: multilevel_roi_align_adjoint(
        gi, bi, per_shapes, strides=STRIDES, output_size=7, sampling_ratio=0,
        aligned=True, chunk=32, level_idx=li))(
            g1, boxes1, lvl)
    for ga, gw in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw),
                                   rtol=1e-4, atol=1e-4)
