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


def test_out_of_contract_roi_gradient():
    """VERDICT r3 #5: out-of-contract (>5:1 window-overflow) ROIs.

    The Pallas forward pools such ROIs from an overflow-BUMPED coarser level
    (`pallas_level_idx`); since round 4 the adjoint recomputes the same
    assignment, so the forward/backward pair is an exact linear map +
    transpose.  Verified here on CPU: the custom-vjp backward with
    use_pallas=True opts must equal plain autodiff of the XLA formulation
    FORCED onto the bumped levels (the exact math the kernel computes for
    in-window ROIs, which post-bump all of these are).
    """
    from articulation3d_tpu.ops.roi_align import (
        multilevel_roi_align_adjoint)
    from articulation3d_tpu.ops.roi_align_pallas import (
        _train_levels, _TrainPoolOpts, pallas_level_idx)
    from articulation3d_tpu.ops.roi_align import assign_boxes_to_levels

    rs = np.random.RandomState(3)
    # full 480x640-scale pyramid: only there can an ROI's sampled extent
    # exceed the 64x80-cell window on its assigned level (at tiny test
    # inputs the whole p2 map fits in one window and nothing ever bumps)
    feats = [jnp.asarray(rs.randn(h, w, 8), jnp.float32)
             for h, w in [(120, 160), (60, 80), (30, 40), (15, 20)]]
    # ~9:1 slivers assigned to p2 whose extent overflows the window (the
    # same adversarial population as bench.py's aspect9 parity check), plus
    # one in-contract box as a control
    boxes = jnp.asarray([[10.0, 200.0, 344.0, 237.0],
                         [200.0, 10.0, 225.0, 460.0],
                         [40.0, 40.0, 120.0, 100.0]], jnp.float32)
    p, sr, aligned = 7, 0, True
    lvl = pallas_level_idx(boxes, n_levels=4, strides=STRIDES, output_size=p,
                           sampling_ratio=sr, aligned=aligned)
    d2 = assign_boxes_to_levels(boxes, min_level=2, max_level=5) - 2
    # the slivers actually bump (the test exercises the overflow path) and
    # the control does not
    assert int(lvl[0]) > int(d2[0]) and int(lvl[1]) > int(d2[1])
    assert int(lvl[2]) == int(d2[2])

    def fwd(fs):
        return multilevel_roi_align(
            list(fs), boxes, strides=STRIDES, output_size=p,
            sampling_ratio=sr, aligned=aligned, level_idx=lvl)

    cot = jnp.asarray(rs.randn(3, p, p, 8), jnp.float32)
    g_auto = jax.grad(lambda fs: jnp.sum(fwd(fs) * cot))(tuple(feats))

    opts = _TrainPoolOpts(strides=STRIDES, output_size=p, sampling_ratio=sr,
                          aligned=aligned, min_level=2, chunk=32,
                          use_pallas=True,
                          shapes=tuple((1,) + f.shape for f in feats),
                          dtypes=tuple(str(f.dtype) for f in feats),
                          adjoint_impl="xla", interpret=False)
    lv = _train_levels(boxes, opts)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(lvl))
    g_adj = multilevel_roi_align_adjoint(
        cot, boxes, [f.shape for f in feats], strides=STRIDES, output_size=p,
        sampling_ratio=sr, aligned=aligned, chunk=32, level_idx=lvl)
    for ga, gj in zip(g_auto, g_adj):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gj),
                                   rtol=1e-5, atol=1e-5)
    # the bumped level (p3) actually receives gradient mass from sliver 0
    assert float(jnp.abs(g_adj[int(lvl[0])]).sum()) > 0.0

    # and SGD with the (forward @ bumped level, adjoint @ bumped level) pair
    # drives a toy regression loss down — the pair is the exact gradient
    target = jnp.asarray(rs.randn(3, p, p, 8), jnp.float32)

    def loss(fs):
        return jnp.mean((fwd(fs) - target) ** 2)

    fs = tuple(feats)
    l0 = float(loss(fs))
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(60):
        g = grad_fn(fs)
        fs = tuple(f - 100.0 * gi for f, gi in zip(fs, g))
    assert float(loss(fs)) < 0.5 * l0


def test_train_pool_valid_masking():
    """`valid` zeroes invalid ROI outputs AND their feature gradients —
    matching the Pallas kernel's predicated-out semantics on CPU."""
    rs = np.random.RandomState(4)
    feats = _feats(rs, b=2)
    boxes = _boxes(rs, b=2, n=6)
    valid = jnp.asarray([[True, True, False, True, False, False],
                         [False, True, True, True, True, False]])
    cot = jnp.asarray(rs.randn(2, 6, 7, 7, 8), jnp.float32)

    def masked_plain(fs):
        def per_image(f, bx):
            return multilevel_roi_align(
                list(f), bx, strides=STRIDES, output_size=7,
                sampling_ratio=0, aligned=True, chunk=32)
        out = jax.vmap(per_image)(tuple(fs), boxes)
        return jnp.where(valid[..., None, None, None], out, 0.0)

    def wrapped(fs):
        return multilevel_roi_align_train(
            fs, boxes, strides=STRIDES, output_size=7, sampling_ratio=0,
            aligned=True, use_pallas=False, valid=valid)

    out_w = wrapped(tuple(feats))
    np.testing.assert_array_equal(np.asarray(masked_plain(tuple(feats))),
                                  np.asarray(out_w))
    # invalid rows are exactly zero
    assert float(jnp.abs(out_w[0, 2]).max()) == 0.0

    g_plain = jax.grad(lambda fs: jnp.sum(masked_plain(fs) * cot))(tuple(feats))
    g_wrap = jax.grad(lambda fs: jnp.sum(wrapped(fs) * cot))(tuple(feats))
    for gp, gw in zip(g_plain, g_wrap):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gw),
                                   rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------- #
# Pallas ADJOINT kernel: CPU emulation of the kernel's exact math
# --------------------------------------------------------------------------- #

def _emulate_pallas_adjoint(feat_shapes, boxes, g, *, p, sr, aligned,
                            valid=None):
    """Replay `multilevel_roi_align_adjoint_pallas`'s per-tile math in numpy
    using the SAME `_prepare` outputs the kernel launch consumes — the
    transposed separable matmuls and window accumulation, minus the pallas
    plumbing (grid, BlockSpecs, VMEM)."""
    from articulation3d_tpu.ops.roi_align_pallas import (_prepare, N_TILES,
                                                         TILE_X, TILE_Y)

    bsz, n = boxes.shape[:2]
    c = feat_shapes[0][-1]
    stubs = [jax.ShapeDtypeStruct(tuple(s), jnp.float32) for s in feat_shapes]
    pr = _prepare(stubs, boxes, strides=STRIDES, output_size=p,
                  sampling_ratio=sr, aligned=aligned, valid=valid,
                  pad_features=False)
    levels = np.asarray(pr["levels"])
    y0, x0 = np.asarray(pr["y0"]), np.asarray(pr["x0"])
    nty, ntx = np.asarray(pr["nty"]), np.asarray(pr["ntx"])
    ry, rx = np.asarray(pr["ry"]), np.asarray(pr["rx"])
    hp, wp = pr["hp"], pr["wp"]

    acc = [np.zeros((bsz, int(hp[l]), int(wp[l]), c), np.float32)
           for l in range(len(feat_shapes))]
    gf = np.asarray(g, np.float32).reshape(bsz * n, p, p, c)
    for t in range(bsz * n):
        b, l = t // n, int(levels[t])
        do_k = np.swapaxes(gf[t], 0, 1)                 # [px, py, c]
        for ty in range(N_TILES):
            for tx in range(N_TILES):
                if ty >= nty[t] or tx >= ntx[t]:
                    continue
                dtp = rx[t, tx].T @ do_k.reshape(p, p * c)
                dt = np.swapaxes(dtp.reshape(TILE_X, p, c), 0, 1)
                dwin = (ry[t, ty].T @ dt.reshape(p, TILE_X * c)).reshape(
                    TILE_Y, TILE_X, c)
                yy, xx = y0[t] + ty * TILE_Y, x0[t] + tx * TILE_X
                acc[l][b, yy:yy + TILE_Y, xx:xx + TILE_X, :] += dwin
    return [a[:, :s[1], :s[2], :] for a, s in zip(acc, feat_shapes)]


@pytest.mark.parametrize("sr,aligned,p", [(0, True, 7), (2, False, 14)])
def test_pallas_adjoint_emulation_matches_xla_adjoint(sr, aligned, p):
    """The Pallas adjoint kernel's math (emulated on CPU) equals the XLA
    corner-scatter adjoint at the kernel's own level assignment — i.e. both
    realize the transpose of the same linear map for in-contract ROIs."""
    from articulation3d_tpu.ops.roi_align import multilevel_roi_align_adjoint
    from articulation3d_tpu.ops.roi_align_pallas import pallas_level_idx

    rs = np.random.RandomState(11)
    feats = _feats(rs, b=2)
    shapes = [f.shape for f in feats]
    boxes = _boxes(rs, b=2, n=6)
    g = jnp.asarray(rs.randn(2, 6, p, p, 8), jnp.float32)

    got = _emulate_pallas_adjoint(shapes, boxes, g, p=p, sr=sr,
                                  aligned=aligned)

    lvl = pallas_level_idx(boxes.reshape(-1, 4), n_levels=4, strides=STRIDES,
                           output_size=p, sampling_ratio=sr,
                           aligned=aligned).reshape(2, 6)
    per_image_shapes = [s[1:] for s in shapes]

    def per_image(g_i, bx_i, lv_i):
        return multilevel_roi_align_adjoint(
            g_i, bx_i, per_image_shapes, strides=STRIDES, output_size=p,
            sampling_ratio=sr, aligned=aligned, chunk=32, level_idx=lv_i)

    want = jax.vmap(per_image)(g, boxes, lvl)
    for ga, gw in zip(got, want):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_adjoint_emulation_valid_masking():
    """Invalid ROIs contribute nothing: nty=0 predication in `_prepare`."""
    rs = np.random.RandomState(12)
    feats = _feats(rs, b=1)
    shapes = [f.shape for f in feats]
    boxes = _boxes(rs, b=1, n=4)
    g = jnp.asarray(rs.randn(1, 4, 7, 7, 8), jnp.float32)
    valid = jnp.asarray([[True, False, True, False]])

    got = _emulate_pallas_adjoint(shapes, boxes, g, p=7, sr=0, aligned=True,
                                  valid=valid)
    # reference: zero the invalid cotangent rows, no valid mask
    g0 = jnp.where(valid[..., None, None, None], g, 0.0)
    want = _emulate_pallas_adjoint(shapes, boxes, g0, p=7, sr=0, aligned=True)
    for ga, gw in zip(got, want):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw),
                                   rtol=1e-6, atol=1e-6)
