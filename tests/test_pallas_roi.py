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


# --------------------------------------------------------------------------- #
# CPU emulation of the kernel's separable math (runs everywhere): the pallas
# body computes out = Ry @ window @ Rx^T accumulated over tiles; emulating it
# with the SAME `_prepare` outputs property-tests the window-coverage claim
# (<= 5:1 aspect exact) and the >5:1 defensive edge clamp without a TPU.
# --------------------------------------------------------------------------- #

def _emulate_pallas(feats, boxes, *, p, sr, aligned):
    import jax.numpy as jnp
    from articulation3d_tpu.ops.roi_align_pallas import (_prepare, N_TILES,
                                                         TILE_X, TILE_Y)

    bsz, n = boxes.shape[:2]
    c = feats[0].shape[-1]
    pr = _prepare(feats, boxes, strides=(4, 8, 16, 32), output_size=p,
                  sampling_ratio=sr, aligned=aligned)
    levels = np.asarray(pr["levels"])
    bids = np.asarray(pr["batch_ids"])
    y0, x0 = np.asarray(pr["y0"]), np.asarray(pr["x0"])
    nty, ntx = np.asarray(pr["nty"]), np.asarray(pr["ntx"])
    ry, rx = np.asarray(pr["ry"]), np.asarray(pr["rx"])
    padded = [np.asarray(f) for f in pr["padded"]]

    total = bsz * n
    out = np.zeros((total, p, p, c), np.float32)
    for i in range(total):
        fmap = padded[levels[i]][bids[i]]
        for ty in range(N_TILES):
            if ty >= nty[i]:
                continue
            for tx in range(N_TILES):
                if tx >= ntx[i]:
                    continue
                win = fmap[y0[i] + ty * TILE_Y:y0[i] + (ty + 1) * TILE_Y,
                           x0[i] + tx * TILE_X:x0[i] + (tx + 1) * TILE_X]
                # kernel order: out[q, p, c] = rx[q, x] ry[p, y] win[y, x, c]
                # (q = x-output, p = y-output; swapped to row-major below)
                out[i] += np.einsum("qx,yxc,py->qpc", rx[i, tx], win,
                                    ry[i, ty])
    # kernel writes [q, p, c] then swaps -> [p, q, c]
    return np.swapaxes(out, 1, 2).reshape(bsz, n, p, p, c)


def _xla_ref(feats, boxes, *, p, sr, aligned):
    from articulation3d_tpu.ops.roi_align import multilevel_roi_align
    return np.asarray(jax.vmap(lambda f2, f3, f4, f5, b: multilevel_roi_align(
        [f2, f3, f4, f5], b, strides=(4, 8, 16, 32), output_size=p,
        sampling_ratio=sr, aligned=aligned))(*feats, boxes))


def _feats(rs, c=8):
    import jax.numpy as jnp
    return [jnp.asarray(rs.randn(1, h, w, c), jnp.float32)
            for h, w in [(120, 160), (60, 80), (30, 40), (15, 20)]]


def test_window_covers_max_size_5to1_boxes():
    """Worst-case per level: max sqrt-area for the level x 5:1 aspect, both
    orientations, at corners and centers — kernel math must be EXACT."""
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    feats = _feats(rs)
    boxes = []
    # canonical sqrt(area) upper bound per assigned level (d2 assignment:
    # level = 4 + log2(sqrt(area)/224), so level l covers up to 224*2^(l-4))
    for max_sqrt_area in (112.0, 224.0, 448.0, 896.0):
        s = max_sqrt_area * 0.99
        for aspect in (5.0, 1.0 / 5.0):
            w = s * np.sqrt(aspect)
            h = s / np.sqrt(aspect)
            for cx, cy in ((w / 2, h / 2), (320, 240),
                           (640 - w / 2, 480 - h / 2)):
                boxes.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    boxes = np.asarray(boxes, np.float32)[None]
    boxes[..., 0::2] = boxes[..., 0::2].clip(0, 640)
    boxes[..., 1::2] = boxes[..., 1::2].clip(0, 480)
    boxes = jnp.asarray(boxes)

    for sr, aligned, p in ((0, True, 7), (0, False, 14), (2, False, 14)):
        ref = _xla_ref(feats, boxes, p=p, sr=sr, aligned=aligned)
        emu = _emulate_pallas(feats, boxes, p=p, sr=sr, aligned=aligned)
        np.testing.assert_allclose(emu, ref, atol=1e-4,
                                   err_msg=f"sr={sr} aligned={aligned}")


def test_random_boxes_emulation_parity():
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    feats = _feats(rs)
    n = 64
    sizes = rs.uniform(16, 500, (1, n, 1))
    aspect = np.exp(rs.uniform(-np.log(5), np.log(5), (1, n, 1)))
    w = sizes * np.sqrt(aspect)
    h = sizes / np.sqrt(aspect)
    x1 = rs.uniform(0, 600, (1, n, 1))
    y1 = rs.uniform(0, 440, (1, n, 1))
    boxes = jnp.asarray(np.concatenate(
        [x1, y1, np.minimum(x1 + w, 640), np.minimum(y1 + h, 480)],
        axis=2).astype(np.float32))
    ref = _xla_ref(feats, boxes, p=7, sr=0, aligned=True)
    emu = _emulate_pallas(feats, boxes, p=7, sr=0, aligned=True)
    np.testing.assert_allclose(emu, ref, atol=1e-4)


def test_non_8_divisible_level_widths_right_edge():
    """Input sizes not divisible by 32 give level widths not divisible by 8
    (e.g. 484x644 -> p2 161 wide).  The x-origin cap must still reach the
    right edge exactly — levels are padded up to an 8-multiple width — so
    right-edge ROIs pool exactly on every level."""
    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    feats = [jnp.asarray(rs.randn(1, h, w, 8), jnp.float32)
             for h, w in [(121, 161), (61, 81), (31, 41), (16, 21)]]
    # one box per assigned level, hugging the right edge of the 644px image
    boxes = []
    for w, h in ((100, 100), (200, 200), (440, 440), (640, 478)):
        y1 = 2.0
        boxes.append([644.0 - w, y1, 644.0, y1 + h])
    boxes = jnp.asarray(np.asarray(boxes, np.float32)[None])

    from articulation3d_tpu.ops.roi_align import assign_boxes_to_levels
    lvls = np.asarray(assign_boxes_to_levels(boxes[0]))
    assert list(lvls) == [2, 3, 4, 5], lvls

    for sr, aligned, p in ((0, True, 7), (0, False, 14), (2, False, 14)):
        ref = _xla_ref(feats, boxes, p=p, sr=sr, aligned=aligned)
        emu = _emulate_pallas(feats, boxes, p=p, sr=sr, aligned=aligned)
        np.testing.assert_allclose(emu, ref, atol=1e-4,
                                   err_msg=f"sr={sr} aligned={aligned}")


def test_extreme_aspect_pools_exactly_from_bumped_level():
    """>5:1 boxes whose cell extent overflows the 64x80 window pool from the
    next coarser level — EXACT bilinear pooling there (vs the old edge-snap
    approximation).  The reference for each box is single-level ROIAlign on
    the bumped level's map."""
    import jax.numpy as jnp
    from articulation3d_tpu.ops.roi_align import multilevel_roi_align

    rs = np.random.RandomState(2)
    feats = _feats(rs)
    # 9:1 aspect at max p2 size: 334 x 37 px -> 84 x 9 cells on p2 (> 80
    # wide) and the transpose (84 tall > 64): both must bump p2 -> p3
    boxes = jnp.asarray([[[10.0, 200.0, 344.0, 237.0],
                          [200.0, 10.0, 237.0, 444.0]]], jnp.float32)
    emu = _emulate_pallas(feats, boxes, p=7, sr=0, aligned=True)
    assert np.all(np.isfinite(emu))
    # reference: the exact XLA pooler FORCED onto p3 (stride 8) — same
    # adaptive-sample-cap semantics as the kernel, single level
    ref = np.asarray(multilevel_roi_align(
        [feats[1][0]], boxes[0], strides=(8,), output_size=7,
        sampling_ratio=0, aligned=True, min_level=3))
    np.testing.assert_allclose(emu[0], ref, atol=1e-4,
                               err_msg="bumped-level pooling (p3)")


def test_top_level_overflow_edge_snap_bound():
    """A near-image-sized >8:1 sliver on a WIDE image overflows the 64x80
    window even at the TOP level (there is no coarser level to bump to) and
    takes the documented defensive edge-snap fallback
    (`_separable_weights`): output bins whose samples stay inside the window
    remain EXACT, and the overflowing tail bins degrade to a bounded
    nearest-cell approximation instead of silently dropping weight."""
    import jax.numpy as jnp
    from articulation3d_tpu.ops.roi_align import assign_boxes_to_levels
    from articulation3d_tpu.ops.roi_align_pallas import _prepare

    rs = np.random.RandomState(4)
    # 2816x480 image -> p5 is 15 x 88 cells: WIDER than the 80-cell window
    feats = [jnp.asarray(rs.randn(1, h, w, 8), jnp.float32)
             for h, w in [(120, 704), (60, 352), (30, 176), (15, 88)]]
    # 2800 x 300 px sliver (9.3:1): sqrt(area) = 917 -> level 5; 87.5 cells
    # wide on p5 > 80
    boxes = jnp.asarray([[[8.0, 100.0, 2808.0, 400.0]]], jnp.float32)
    assert int(assign_boxes_to_levels(boxes[0])[0]) == 5
    pr = _prepare(feats, boxes, strides=(4, 8, 16, 32), output_size=7,
                  sampling_ratio=0, aligned=True)
    assert int(np.asarray(pr["levels"])[0]) == 3  # stayed on p5: no bump

    emu = _emulate_pallas(feats, boxes, p=7, sr=0, aligned=True)
    ref = _xla_ref(feats, boxes, p=7, sr=0, aligned=True)
    assert np.all(np.isfinite(emu))
    # the window covers cells [0, 80) of the ROI's 87.5: bins 0..5 span
    # cells [0, 75] (12.5 cells/bin), every bilinear tap <= cell 76 -> EXACT;
    # bin 6's tail samples land past cell 80 and snap to the window edge
    np.testing.assert_allclose(emu[0, 0, :, :6], ref[0, 0, :, :6], atol=1e-4)
    tail_err = np.abs(emu[0, 0, :, 6] - ref[0, 0, :, 6]).max()
    # both values are convex averages of p5 cells, so the approximation is
    # bounded by the value spread of the level itself — never unbounded
    bound = 2.0 * float(np.abs(np.asarray(feats[3])).max())
    assert tail_err < bound, (tail_err, bound)
    assert tail_err > 1e-4            # the fallback actually engaged


def test_in_contract_boxes_never_bump():
    """<=5:1 boxes at max level size keep their sqrt-area level (the bump
    must not perturb the exact in-contract path)."""
    import jax.numpy as jnp
    from articulation3d_tpu.ops.roi_align import assign_boxes_to_levels
    from articulation3d_tpu.ops.roi_align_pallas import _prepare

    boxes = []
    for max_sqrt_area in (112.0, 224.0, 448.0):
        s = max_sqrt_area * 0.99
        for aspect in (5.0, 1.0 / 5.0, 1.0):
            w, h = s * np.sqrt(aspect), s / np.sqrt(aspect)
            boxes.append([320 - w / 2, 240 - h / 2, 320 + w / 2, 240 + h / 2])
    boxes = jnp.asarray(np.asarray(boxes, np.float32)[None])
    rs = np.random.RandomState(0)
    feats = _feats(rs)
    pr = _prepare(feats, boxes, strides=(4, 8, 16, 32), output_size=7,
                  sampling_ratio=0, aligned=True)
    assigned = np.asarray(assign_boxes_to_levels(boxes[0])) - 2
    np.testing.assert_array_equal(np.asarray(pr["levels"]), assigned)
