"""Tests for `multilevel_roi_align_train` (custom-VJP training pooler).

The training pooler pairs a fast forward (Pallas on TPU, XLA gather on CPU)
with a hand-written adjoint backward (`multilevel_roi_align_adjoint`) that
scatter-adds the same corner weights the forward gathers — the exact adjoint
of torchvision roi_align's forward.  On CPU both paths realize the same
linear map, so the wrapper's gradients must match plain autodiff of the XLA
formulation up to f32 accumulation order.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from articulation3d_tpu.ops.roi_align import multilevel_roi_align
from articulation3d_tpu.ops.roi_align_pallas import multilevel_roi_align_train

STRIDES = (4, 8, 16, 32)


def _feats(rs, b=2, c=8, h=64, w=80):
    return [jnp.asarray(rs.randn(b, h // s * 4, w // s * 4, c), jnp.float32)
            for s in STRIDES]


def _boxes(rs, b=2, n=6, h=256, w=320):
    x1 = rs.uniform(0, w * 0.7, (b, n))
    y1 = rs.uniform(0, h * 0.7, (b, n))
    bw = rs.uniform(8, w * 0.3, (b, n))
    bh = rs.uniform(8, h * 0.3, (b, n))
    return jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], -1), jnp.float32)


@pytest.mark.parametrize("sr,aligned,p", [(0, True, 7), (2, False, 14)])
def test_train_pool_matches_autodiff_on_cpu(sr, aligned, p):
    rs = np.random.RandomState(0)
    feats = _feats(rs)
    boxes = _boxes(rs)
    cot = jnp.asarray(rs.randn(2, 6, p, p, 8), jnp.float32)

    def plain(fs):
        def per_image(f, bx):
            return multilevel_roi_align(
                list(f), bx, strides=STRIDES, output_size=p,
                sampling_ratio=sr, aligned=aligned, chunk=32)
        return jax.vmap(per_image)(tuple(fs), boxes)

    def wrapped(fs):
        return multilevel_roi_align_train(
            fs, boxes, strides=STRIDES, output_size=p, sampling_ratio=sr,
            aligned=aligned, chunk=32, use_pallas=False)

    out_p, out_w = plain(feats), wrapped(feats)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_w))

    g_plain = jax.grad(lambda fs: jnp.sum(plain(fs) * cot))(tuple(feats))
    g_wrap = jax.grad(lambda fs: jnp.sum(wrapped(fs) * cot))(tuple(feats))
    for gp, gw in zip(g_plain, g_wrap):
        assert bool(jnp.all(jnp.isfinite(gw)))
        # same linear map, hand-written adjoint: identical up to f32
        # accumulation order in the scatter
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gw),
                                   rtol=1e-5, atol=1e-5)
    # gradients actually reach the finest level (nonzero scatter)
    assert float(jnp.abs(g_wrap[0]).max()) > 0.0


def test_train_pool_zero_box_cotangent():
    """Boxes receive an explicit ZERO cotangent (d2 parity: no gradient ever
    flows through ROI coordinates)."""
    rs = np.random.RandomState(1)
    feats = _feats(rs, b=1)
    boxes = _boxes(rs, b=1, n=3)

    def loss(bx):
        out = multilevel_roi_align_train(
            feats, bx, strides=STRIDES, output_size=7, sampling_ratio=0,
            aligned=True, use_pallas=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(boxes)
    np.testing.assert_array_equal(np.asarray(g), np.zeros_like(np.asarray(g)))


def test_train_pool_under_jit_and_value_and_grad():
    """The shipped usage: jitted value_and_grad through the pooler."""
    rs = np.random.RandomState(2)
    feats = _feats(rs, b=1)
    boxes = _boxes(rs, b=1, n=4)

    @jax.jit
    def step(fs):
        def loss(fs_):
            out = multilevel_roi_align_train(
                fs_, boxes, strides=STRIDES, output_size=7,
                sampling_ratio=0, aligned=True, use_pallas=False)
            return jnp.sum(jnp.abs(out))
        return jax.value_and_grad(loss)(fs)

    val, grads = step(tuple(feats))
    assert np.isfinite(float(val))
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
