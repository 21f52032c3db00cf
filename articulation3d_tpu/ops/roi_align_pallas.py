"""Pallas TPU kernel for multilevel ROIAlign — the model's hottest op.

The XLA gather formulation (`roi_align.py`) samples 784+ scattered 1KB rows
per ROI; TPU gathers of scattered rows run at ~5-50 GB/s, making the ROI
stage ~10x slower than the backbone.  This kernel restructures the op around
the memory system:

  * the FPN level assignment (`assign_boxes_to_levels`) bounds sqrt(area)
    to < 28 cells on the assigned level, so a 64x80-cell window covers every
    ROI up to ~5:1 aspect ratio.  The window is processed as a 2x2 grid of
    32x40 tiles, and tiles an ROI does not span are skipped (predicated DMA
    + accumulate), so the typical ROI costs ONE 32x40xC DMA;
  * ALL torchvision sampling semantics (V1/V2 offsets, adaptive sample
    counts, bilinear corner weights, out-of-range zeroing, edge clamping)
    fold into per-ROI separable weight matrices Ry (P, 64), Rx (P, 80),
    precomputed in cheap XLA on tiny arrays;
  * per (ROI, tile): one strided DMA HBM->VMEM and two small MXU matmuls
        t = Ry_tile @ win.reshape(32, 40*C)
        out[q, p, c] += Rx_tile @ t'              (t' = axis swap)
    accumulated across tiles into the resident output block — pure
    sequential-bandwidth traffic, no gathers.

The grid is one step per GROUP of ROIs; the 2x2 tile loop is unrolled
in-kernel with predication, and window DMAs are double-buffered ACROSS grid
steps through GROUP statically-indexed slots (slot g is refilled with the
next group's ROI as soon as it is computed), so the typical ROI's window DMA
is already in flight when its matmuls begin.

Per-ROI level/image/window origins are scalar-prefetched so DMA addresses
are known before the body runs.  Tile DMAs never run off the map: window
origins are clamped into bounds on levels at least one window tall/wide,
and only levels smaller than the window are zero-padded up to it (padded
cells always carry zero weight; real out-of-range semantics are encoded in
Ry/Rx).  Dynamic offsets on the tiled x dim must be 8-aligned: x origins
round down to 8 (absorbed by the 40-wide x tiles) and level widths round up
to a multiple of 8 so the origin cap reaches the right edge exactly.

Known approximation: an ROI whose cell extent exceeds the fixed window
(beyond ~5:1 tall / ~8:1 wide at the maximum size for its sqrt-area level)
is pooled from the next coarser level(s) where it fits — exact bilinear
pooling at halved resolution (torchvision would pool it from the assigned
level).  ROIs within the FPN level-assignment contract
(`assign_boxes_to_levels`) up to 5:1 aspect are covered exactly —
property-tested in `tests/test_pallas_roi.py` via a CPU emulation of the
kernel's separable matmul math.  Only an ROI still overflowing at the
TOP level (a near-image-sized >8:1 sliver) falls back to the defensive
edge-clamp in `_separable_weights`.

Gradients: `multilevel_roi_align_train` (bottom of this file) pairs this
kernel as the FORWARD with a hand-written adjoint scatter
(`multilevel_roi_align_adjoint`) as the BACKWARD via jax.custom_vjp, so
training gets the fast window-DMA forward while the feature gradient stays
the reference-exact scatter (torchvision's own backward is the adjoint of
its forward).  The adjoint recomputes the kernel's own level assignment
(`pallas_level_idx`), so even out-of-contract overflow-bumped ROIs get the
exact transpose of the level they were actually pooled from; the only
remaining forward/backward divergence is the defensive edge-snap for a
near-image-sized >8:1 sliver still overflowing at the TOP level.
"""

from __future__ import annotations

import collections
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import (_sample_coords, assign_boxes_to_levels,
                        multilevel_roi_align, multilevel_roi_align_adjoint)

TILE_Y = 32   # rows per window tile (dynamic y offsets are unconstrained)
TILE_X = 40   # cols per tile (x origin 8-aligned; 40 = 32 + 8 slack)
N_TILES = 2   # tiles per axis -> 64 x 80 cell coverage
# per-launch ROI cap: six int32 scalar-prefetch arrays (24B/ROI) must fit
# the 1MB SMEM; larger batches recurse over image chunks
MAX_ROIS_PER_LAUNCH = 32768


def _separable_weights(coord, mask, n_s, size, origin, win_n):
    """Fold sampling + bilinear + averaging into (N, P, win_n) weights.

    coord: (N, P, S) absolute sample coords on the assigned level;
    mask: (N, P, S) adaptive-sample mask; n_s: (N,) sample counts;
    size: (N,) real level extent (H or W); origin: (N,) window origin.
    Exact `_bilinear_gather` semantics (clamp / OOB-zero / edge snap).
    """
    h = size[:, None, None].astype(jnp.float32)
    hi = size[:, None, None]
    oor = (coord < -1.0) | (coord > h)
    y = jnp.clip(coord, 0.0, None)
    y_low = jnp.minimum(y.astype(jnp.int32), hi - 1)
    y_high = jnp.minimum(y_low + 1, hi - 1)
    y = jnp.where(y.astype(jnp.int32) >= hi - 1, y_low.astype(y.dtype), y)
    ly = y - y_low.astype(y.dtype)
    hy = 1.0 - ly

    w_lo = jnp.where(oor, 0.0, hy) * mask
    w_hi = jnp.where(oor, 0.0, ly) * mask

    rel_lo = y_low - origin[:, None, None]            # (N, P, S)
    rel_hi = y_high - origin[:, None, None]
    # DEFENSIVE CLAMP for >5:1-aspect ROIs at max level size: tail samples
    # past the window snap to the window edge (nearest-cell approximation)
    # instead of silently dropping their weight.  In-window ROIs are
    # unaffected: their rel indices are already in range.
    rel_lo = jnp.clip(rel_lo, 0, win_n - 1)
    rel_hi = jnp.clip(rel_hi, 0, win_n - 1)
    win_ids = jnp.arange(win_n, dtype=jnp.int32)
    one_lo = (rel_lo[..., None] == win_ids).astype(jnp.float32)
    one_hi = (rel_hi[..., None] == win_ids).astype(jnp.float32)
    w = jnp.sum(one_lo * w_lo[..., None] + one_hi * w_hi[..., None], axis=2)
    return w / jnp.maximum(n_s, 1)[:, None, None].astype(jnp.float32)


def pallas_level_idx(flat_boxes: jnp.ndarray, *, n_levels: int,
                     strides: Sequence[int], output_size: int,
                     sampling_ratio: int, aligned: bool,
                     min_level: int = 2) -> jnp.ndarray:
    """The 0-based level assignment the Pallas kernel ACTUALLY pools from.

    detectron2's sqrt-area assignment (`assign_boxes_to_levels`) plus the
    window-overflow bump: an ROI whose SAMPLED extent would exceed the fixed
    64x80-cell window (beyond ~5:1 tall / ~8:1 wide at the max size for its
    assigned level) pools from the next coarser level(s) where it fits —
    exact bilinear pooling at halved resolution.  The sampled extent
    (first/last sample gap, a bin-fraction smaller than the box extent) is
    what the window must cover; margins hold the floor-origin (-1 / +2
    cells) and the 8-aligned x origin (up to 7 cells).  Sample spans scale
    exactly with 1/stride, so the bump count is a log2 of the overflow
    ratio.  ROIs within the sqrt-area level contract up to 5:1 aspect never
    bump.

    Exposed so the training pooler's adjoint can scatter gradients to the
    SAME levels the Pallas forward read (`multilevel_roi_align_adjoint`'s
    `level_idx`), keeping forward/backward an exact linear-map/transpose
    pair even for out-of-contract ROIs.
    """
    span_y = TILE_Y * N_TILES
    span_x = TILE_X * N_TILES
    levels = assign_boxes_to_levels(
        flat_boxes, min_level=min_level,
        max_level=min_level + n_levels - 1) - min_level            # (T,)
    scale_table = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    scales0 = scale_table[levels]
    ys0, xs0, ym0, xm0 = _sample_coords(
        flat_boxes, scales0, output_size, sampling_ratio, aligned,
        adaptive_cap=4)
    big0 = jnp.float32(1e9)
    y_min0 = jnp.min(jnp.where(ym0 > 0, ys0, big0), axis=(1, 2))
    y_max0 = jnp.max(jnp.where(ym0 > 0, ys0, -big0), axis=(1, 2))
    x_min0 = jnp.min(jnp.where(xm0 > 0, xs0, big0), axis=(1, 2))
    x_max0 = jnp.max(jnp.where(xm0 > 0, xs0, -big0), axis=(1, 2))
    # exact window need at the assigned level, mirroring the origin rules in
    # `_prepare` (floor - 1, clamped at 0; x additionally floored to 8)
    need_y0 = jnp.floor(y_max0) + 2 - jnp.maximum(jnp.floor(y_min0) - 1, 0.0)
    x0_al = jnp.floor(jnp.maximum(jnp.floor(x_min0) - 1, 0.0) / 8) * 8
    need_x0 = jnp.floor(x_max0) + 2 - x0_al
    overflow = (need_y0 > span_y) | (need_x0 > span_x)
    # bump count from the sample spans (they scale exactly with 1/stride);
    # -4 / -11 margins cover origin flooring and the 8-aligned x origin at
    # the bumped level
    over = jnp.maximum((y_max0 - y_min0) / float(span_y - 4),
                       (x_max0 - x_min0) / float(span_x - 11))
    b_req = jnp.ceil(jnp.log2(jnp.maximum(over, 1.0))).astype(jnp.int32)
    bump = jnp.where(overflow, jnp.maximum(b_req, 1), 0)
    return jnp.minimum(levels + bump, n_levels - 1)


def _group_size(dtype) -> int:
    """ROIs per grid step = DMA pipeline depth (slots are STATIC).

    Deeper grouping amortizes the fixed per-grid-step cost (~3-4us even for
    fully predicated-out slots); bf16 windows fit 4 slots in VMEM, f32 only
    2 (GROUP=4 f32 overflows VMEM and fails the remote TPU compile).
    """
    return 4 if dtype == jnp.bfloat16 else 2


def _kernel(level_ref, b_ref, y0_ref, x0_ref, nty_ref, ntx_ref,
            ry_ref, rx_ref, f2_ref, f3_ref, f4_ref, f5_ref,
            out_ref, win, sems):
    """GROUP ROIs per grid step, DMA double-buffered across steps.

    Slot g (static index) holds ROI k*GROUP+g's window tiles, DMA'd during
    step k-1; after computing it, the slot is refilled with ROI
    (k+1)*GROUP+g's tiles, so window transfers for one slot overlap the
    matmuls of the other.  The 2x2 tile loop is unrolled in-kernel with
    predication instead of being grid dimensions: a typical (one-tile) ROI
    costs half a grid invocation and never serializes on its own DMA.  All
    scratch indices are compile-time constants — dynamic (traced) slot
    numbers force slow dynamic-slice codegen on VMEM reads.
    """
    k = pl.program_id(0)
    n_groups = pl.num_programs(0)
    feats = (f2_ref, f3_ref, f4_ref, f5_ref)
    c = win.shape[-1]
    p = ry_ref.shape[2]
    group = win.shape[0]

    def start_dmas(roi, g):
        level = level_ref[roi]
        b = b_ref[roi]
        for ty in range(N_TILES):
            for tx in range(N_TILES):
                needed = (ty < nty_ref[roi]) & (tx < ntx_ref[roi])
                y0 = y0_ref[roi] + ty * TILE_Y
                x0 = pl.multiple_of(x0_ref[roi], 8) + tx * TILE_X
                for l, f in enumerate(feats):
                    @pl.when(needed & (level == l))
                    def _(f=f, ty=ty, tx=tx, y0=y0, x0=x0):
                        pltpu.make_async_copy(
                            f.at[b, pl.ds(y0, TILE_Y), pl.ds(x0, TILE_X), :],
                            win.at[g, ty, tx],
                            sems.at[g, ty, tx]).start()

    @pl.when(k == 0)
    def _prologue():
        for g in range(group):
            start_dmas(g, g)

    for g in range(group):
        roi = k * group + g
        out_ref[g] = jnp.zeros_like(out_ref[g])
        for ty in range(N_TILES):
            for tx in range(N_TILES):
                needed = (ty < nty_ref[roi]) & (tx < ntx_ref[roi])

                @pl.when(needed)
                def _tile(g=g, ty=ty, tx=tx):
                    # reconstruct the copy descriptor to wait on this tile's
                    # semaphore for the exact transferred byte count (the
                    # source slice only contributes its shape)
                    pltpu.make_async_copy(
                        f2_ref.at[0, pl.ds(0, TILE_Y), pl.ds(0, TILE_X), :],
                        win.at[g, ty, tx],
                        sems.at[g, ty, tx]).wait()
                    ry = ry_ref[g, ty]                    # (P, TILE_Y)
                    rx = rx_ref[g, tx]                    # (P, TILE_X)
                    wvals = win[g, ty, tx]
                    if wvals.dtype == jnp.bfloat16:
                        # bf16 features: single-pass MXU matmuls (f32 runs
                        # as a multi-pass decomposition, ~3x the cycles).
                        # The weights' bf16 rounding adds ~2^-9 relative
                        # error on top of the features' own quantization.
                        t = jnp.dot(ry, wvals.reshape(TILE_Y, TILE_X * c),
                                    preferred_element_type=jnp.float32)
                        t = t.reshape(p, TILE_X, c)
                        t = jnp.swapaxes(t, 0, 1).reshape(TILE_X, p * c)
                        o = jnp.dot(rx, t.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    else:
                        t = jnp.dot(ry, wvals.reshape(TILE_Y, TILE_X * c),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                        t = t.reshape(p, TILE_X, c)
                        t = jnp.swapaxes(t, 0, 1).reshape(TILE_X, p * c)
                        o = jnp.dot(rx, t,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                    out_ref[g] += o.reshape(p, p, c)      # [q, p, c]

        # refill slot g for the next group only after computing from it
        @pl.when(k + 1 < n_groups)
        def _prefetch(g=g, roi=roi):
            start_dmas(roi + group, g)


def _prepare(features: Sequence[jnp.ndarray], boxes: jnp.ndarray, *,
             strides: Sequence[int], output_size: int, sampling_ratio: int,
             aligned: bool, min_level: int = 2, valid=None,
             pad_features: bool = True):
    """Host-side (cheap XLA) prologue shared by the kernel launch and the
    CPU emulation in tests: level assignment, window origins/extents, and
    the per-ROI separable weight matrices.

    pad_features=False (the adjoint kernel's path) skips building the
    padded feature arrays — `features` may then be any objects with
    `.shape`; the returned dict carries the padded SHAPES (`hp`, `wp`)
    instead of `padded`.
    """
    bsz, n = boxes.shape[:2]
    p = output_size
    flat_boxes = boxes.reshape(bsz * n, 4)
    total = bsz * n
    span_y = TILE_Y * N_TILES
    span_x = TILE_X * N_TILES

    # detectron2 assignment + window-overflow bump (shared with the training
    # adjoint so gradients scatter to the level the forward read)
    levels = pallas_level_idx(
        flat_boxes, n_levels=len(features), strides=strides,
        output_size=p, sampling_ratio=sampling_ratio, aligned=aligned,
        min_level=min_level)
    hs = np.array([f.shape[1] for f in features], np.int32)
    ws = np.array([f.shape[2] for f in features], np.int32)
    scale_table = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    heights = jnp.asarray(hs)[levels]
    widths = jnp.asarray(ws)[levels]
    scales = scale_table[levels]

    # Tile DMAs must never run off the map.  Levels at least one window tall/
    # wide need NO padding: the window origin is clamped into bounds instead
    # (moving the origin down only widens coverage; the separable weights
    # reference absolute cells relative to the clamped origin, so numerics
    # are unchanged).  Only levels smaller than the window (p3-p5) are padded
    # up to the window size — this avoids recopying the large p2 map (~700MB
    # per pooler call at batch 32).  The feature dtype is preserved (bf16
    # halves the window-DMA traffic; accumulation stays f32 in VMEM).
    hp = np.maximum(hs, span_y)
    # round widths up to a multiple of 8 (at most 7 extra columns) so the
    # 8-aligned x-origin cap below sits exactly at wp - span_x: without this,
    # any level width not divisible by 8 would floor the cap up to 7 columns
    # short of the right edge and right-edge samples would get edge-snapped
    # by the defensive clamp in `_separable_weights`
    wp = (np.maximum(ws, span_x) + 7) // 8 * 8
    padded = None
    if pad_features:
        padded = [f if (hp[l] == hs[l] and wp[l] == ws[l]) else
                  jnp.pad(f, ((0, 0), (0, int(hp[l] - hs[l])),
                              (0, int(wp[l] - ws[l])), (0, 0)))
                  for l, f in enumerate(features)]
    y0_cap = jnp.asarray(hp - span_y, jnp.int32)[levels]          # (T,)
    x0_cap = jnp.asarray(wp - span_x, jnp.int32)[levels]          # 8-aligned

    ys, xs, y_mask, x_mask = _sample_coords(
        flat_boxes, scales, p, sampling_ratio, aligned, adaptive_cap=4)
    if sampling_ratio > 0:
        n_sh = jnp.full((total,), sampling_ratio, jnp.int32)
        n_sw = n_sh
    else:
        n_sh = jnp.sum(y_mask[:, 0, :], axis=1).astype(jnp.int32)
        n_sw = jnp.sum(x_mask[:, 0, :], axis=1).astype(jnp.int32)

    big = jnp.float32(1e9)
    y_min = jnp.min(jnp.where(y_mask > 0, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(y_mask > 0, ys, -big), axis=(1, 2))
    x_min = jnp.min(jnp.where(x_mask > 0, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(x_mask > 0, xs, -big), axis=(1, 2))

    y0 = jnp.maximum(jnp.floor(y_min).astype(jnp.int32) - 1, 0)
    x0 = jnp.maximum(jnp.floor(x_min).astype(jnp.int32) - 1, 0)
    x0 = (x0 // 8) * 8  # x origin must be 8-aligned for the tiled HBM slice
    # clamp origins so the full window stays inside the (possibly padded)
    # map; caps are 8-aligned by construction so x0 stays aligned
    y0 = jnp.minimum(y0, y0_cap)
    x0 = jnp.minimum(x0, x0_cap)

    # tiles an ROI actually spans (1 or 2 per axis); +1 covers y_high
    need_y = jnp.floor(y_max).astype(jnp.int32) + 2 - y0
    need_x = jnp.floor(x_max).astype(jnp.int32) + 2 - x0
    nty = jnp.clip((need_y + TILE_Y - 1) // TILE_Y, 1, N_TILES).astype(jnp.int32)
    ntx = jnp.clip((need_x + TILE_X - 1) // TILE_X, 1, N_TILES).astype(jnp.int32)
    if valid is not None:
        # invalid (padded) ROIs: zero tiles -> the kernel's `ty < nty`
        # predicate skips both the window DMAs and the matmuls, so the
        # pool's cost tracks the VALID ROI count (outputs stay zero and are
        # masked out downstream anyway)
        nty = jnp.where(valid.reshape(total), nty, 0)

    ry = _separable_weights(ys, y_mask, n_sh, heights, y0, span_y)
    rx = _separable_weights(xs, x_mask, n_sw, widths, x0, span_x)
    # split into per-tile blocks: (T, N_TILES, P, TILE)
    ry = jnp.swapaxes(ry.reshape(total, p, N_TILES, TILE_Y), 1, 2)
    rx = jnp.swapaxes(rx.reshape(total, p, N_TILES, TILE_X), 1, 2)

    batch_ids = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n)
    return dict(levels=levels, batch_ids=batch_ids, y0=y0, x0=x0,
                nty=nty, ntx=ntx, ry=ry, rx=rx, padded=padded,
                hp=hp, wp=wp)


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray, *,
                                strides: Sequence[int], output_size: int,
                                sampling_ratio: int, aligned: bool,
                                min_level: int = 2,
                                valid: jnp.ndarray | None = None,
                                interpret: bool = False) -> jnp.ndarray:
    """Batched FPN ROIAlign: features (B, H_l, W_l, C) x4, boxes (B, N, 4)
    -> (B, N, P, P, C) float32.

    `valid` (B, N) bool, optional: invalid ROIs produce zeros and cost
    nothing (their window DMAs and matmuls are predicated out), so heavily
    padded ROI sets pool in time proportional to the valid count.
    """
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    p = output_size
    total = bsz * n
    # SMEM holds the six scalar-prefetch arrays (24B/ROI) in a 1MB space:
    # above ~32k ROIs per launch (batch 64 x 1000 proposals) the compile
    # fails "ran out of memory in memory space smem" — recurse over image
    # chunks (each launch sees a contiguous slice of the batch)
    if total > MAX_ROIS_PER_LAUNCH:
        kw = dict(strides=strides, output_size=output_size,
                  sampling_ratio=sampling_ratio, aligned=aligned,
                  min_level=min_level, interpret=interpret)
        outs = []
        if bsz > 1:
            img_chunk = max(1, MAX_ROIS_PER_LAUNCH // n)
            for s in range(0, bsz, img_chunk):
                e = min(s + img_chunk, bsz)
                outs.append(multilevel_roi_align_pallas(
                    [f[s:e] for f in features], boxes[s:e],
                    valid=None if valid is None else valid[s:e], **kw))
            return jnp.concatenate(outs, axis=0)
        # single image with an oversized ROI set: chunk over the ROI axis
        # (each launch pools a contiguous slice of the boxes)
        for s in range(0, n, MAX_ROIS_PER_LAUNCH):
            e = min(s + MAX_ROIS_PER_LAUNCH, n)
            outs.append(multilevel_roi_align_pallas(
                features, boxes[:, s:e],
                valid=None if valid is None else valid[:, s:e], **kw))
        return jnp.concatenate(outs, axis=1)
    pr = _prepare(features, boxes, strides=strides, output_size=output_size,
                  sampling_ratio=sampling_ratio, aligned=aligned,
                  min_level=min_level, valid=valid)
    levels, batch_ids = pr["levels"], pr["batch_ids"]
    y0, x0, nty, ntx = pr["y0"], pr["x0"], pr["nty"], pr["ntx"]
    ry, rx, padded = pr["ry"], pr["rx"], pr["padded"]
    if features[0].dtype == jnp.bfloat16:
        # weight matrices match the feature dtype so the kernel's matmuls
        # take the single-pass bf16 MXU path
        ry, rx = ry.astype(jnp.bfloat16), rx.astype(jnp.bfloat16)

    group = _group_size(features[0].dtype)
    # pad the ROI count to a multiple of the group with dummy zero-tile ROIs
    # (level 0, image 0, origin 0) so every grid step is full
    total_p = ((total + group - 1) // group) * group
    if total_p != total:
        extra = total_p - total
        pad1 = lambda a, v: jnp.concatenate(
            [a, jnp.full((extra,) + a.shape[1:], v, a.dtype)])
        levels, batch_ids = pad1(levels, 0), pad1(batch_ids, 0)
        y0, x0 = pad1(y0, 0), pad1(x0, 0)
        nty, ntx = pad1(nty, 0), pad1(ntx, 1)   # 0 tiles: dummies cost nothing
        ry, rx = pad1(ry, 0), pad1(rx, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(total_p // group,),
        in_specs=[
            pl.BlockSpec((group, N_TILES, p, TILE_Y),
                         lambda k, *_: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, N_TILES, p, TILE_X),
                         lambda k, *_: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((group, p, p, c),
                               lambda k, *_: (k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # `group` static slots x 2x2 tiles: windows for group k (compute)
            # refilled with group k+1's as each slot finishes
            pltpu.VMEM((group, N_TILES, N_TILES, TILE_Y, TILE_X, c),
                       features[0].dtype),
            pltpu.SemaphoreType.DMA((group, N_TILES, N_TILES)),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_p, p, p, c), jnp.float32),
        interpret=interpret,
    )(levels, batch_ids, y0, x0, nty, ntx, ry, rx, *padded)
    out = out[:total]

    # kernel writes [q, p, c]; swap to [p, q, c] = (row, col, C)
    out = jnp.swapaxes(out, 1, 2)
    return out.reshape(bsz, n, p, p, c)


# --------------------------------------------------------------------------- #
# Pallas ADJOINT kernel: the exact transpose of the forward, as matmuls
# --------------------------------------------------------------------------- #
# The XLA adjoint (`multilevel_roi_align_adjoint`) scatter-adds 4 corner
# weights per sample — millions of single-row scatter updates that XLA
# lowers to a slow scatter tree (~280 ms for 4096 ROIs on v5e, the dominant
# cost of trainable-trunk recipes).  This kernel transposes the forward's
# OWN separable formulation instead: per (ROI, tile)
#     dt'  = Rx_tile^T @ do          (do = pooled cotangent, kernel layout)
#     dwin = Ry_tile^T @ dt          (after the same axis swap, reversed)
#     dfeat[window] += dwin          (VMEM accumulate, sequential grid)
# The per-level gradient accumulator is a single VMEM SCRATCH buffer,
# resident across every ROI of an image (grid = (batch, roi_groups)) and
# manually DMA'd to the HBM output at each image's last group — scratch
# rather than an out BlockSpec because the pipeline double-buffers out
# blocks, which would double the accumulator footprint past the 16MB VMEM
# limit.  TPU grids execute sequentially, so read-modify-write of
# overlapping ROI windows is race-free by construction.  Because dwin is
# built from the SAME Ry/Rx the forward used (including the defensive
# window-edge snap), forward/backward form an exact linear-map/transpose
# pair for ALL ROIs — even the >8:1 top-level slivers whose edge-snap the
# XLA adjoint could not reproduce.
#
# VMEM budget: a (1, Hp, Wp, cpass) f32 accumulator per level in the
# launch.  Levels are packed into launches and channels split into blocks
# of <= 128 so the accumulators fit ~10MB; each (launch, channel-block) is
# its own pallas_call writing a disjoint channel slice.

ADJ_GROUP = 8   # ROIs per grid step (amortizes fixed per-step cost; the
                # adjoint has no DMA slots, so the only VMEM cost of a
                # deeper group is the pipelined g/Ry/Rx in-blocks)
_ADJ_VMEM_BUDGET = 10 * 2 ** 20


def _adjoint_kernel_factory(lvl_ids, group, p, cpass):
    """Kernel for one (level-set, channel-block) launch.

    The per-level accumulators are SCRATCH VMEM (a single resident copy —
    an out-BlockSpec accumulator would be double-buffered by the pipeline
    and blow the 16MB VMEM limit); each image's finished accumulator is
    manually DMA'd to the HBM output at the image's last ROI group.
    """
    n_lvl = len(lvl_ids)

    def kernel(level_ref, y0_ref, x0_ref, nty_ref, ntx_ref,
               g_ref, ry_ref, rx_ref, *rest):
        outs = rest[:n_lvl]                       # HBM (ANY) full arrays
        accs = rest[n_lvl:2 * n_lvl]              # VMEM scratch per level
        sems = rest[2 * n_lvl:]                   # one DMA sem per level
        b = pl.program_id(0)
        k = pl.program_id(1)
        n_groups = pl.num_programs(1)

        @pl.when(k == 0)
        def _zero():   # fresh image: clear the resident accumulators
            for a in accs:
                a[...] = jnp.zeros_like(a[...])

        base = (b * n_groups + k) * group
        for g in range(group):
            roi = base + g
            # host layout is [py, px, c]; the forward kernel's internal
            # layout (which Ry/Rx transpose against) is [px, py, c]
            do_k = jnp.swapaxes(g_ref[g], 0, 1)
            for ty in range(N_TILES):
                for tx in range(N_TILES):
                    needed = (ty < nty_ref[roi]) & (tx < ntx_ref[roi])
                    for oi, l in enumerate(lvl_ids):

                        @pl.when(needed & (level_ref[roi] == l))
                        def _acc(oi=oi, ty=ty, tx=tx, g=g, roi=roi,
                                 do_k=do_k):
                            ry = ry_ref[g, ty]          # (P, TILE_Y) f32
                            rx = rx_ref[g, tx]          # (P, TILE_X) f32
                            # exact transpose of the forward tile matmuls
                            dtp = jnp.dot(
                                rx.T, do_k.reshape(p, p * cpass),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                            dt = jnp.swapaxes(
                                dtp.reshape(TILE_X, p, cpass), 0, 1)
                            dwin = jnp.dot(
                                ry.T, dt.reshape(p, TILE_X * cpass),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                            yy = y0_ref[roi] + ty * TILE_Y
                            xx = (pl.multiple_of(x0_ref[roi], 8)
                                  + tx * TILE_X)
                            idx = (pl.ds(yy, TILE_Y), pl.ds(xx, TILE_X),
                                   slice(None))
                            accs[oi][idx] += dwin.reshape(
                                TILE_Y, TILE_X, cpass)

        @pl.when(k == n_groups - 1)
        def _flush():   # image done: ship the accumulators to HBM
            for oi in range(n_lvl):
                cp = pltpu.make_async_copy(accs[oi], outs[oi].at[b],
                                           sems[oi])
                cp.start()
                cp.wait()

    return kernel


def multilevel_roi_align_adjoint_pallas(
        g: jnp.ndarray, boxes: jnp.ndarray,
        feat_shapes: Sequence[Sequence[int]], *, strides: Sequence[int],
        output_size: int, sampling_ratio: int, aligned: bool,
        min_level: int = 2, valid: jnp.ndarray | None = None,
        interpret: bool = False):
    """Adjoint of `multilevel_roi_align_pallas` w.r.t. the FEATURES.

    g: (B, N, P, P, C) f32 pooled cotangent; boxes: (B, N, 4);
    feat_shapes: per-level full (B, H_l, W_l, C).
    Returns the per-level (B, H_l, W_l, C) float32 feature gradients.
    """
    bsz, n = boxes.shape[:2]
    p = int(output_size)
    c = int(feat_shapes[0][-1])
    if bsz * n > MAX_ROIS_PER_LAUNCH:
        kw = dict(strides=strides, output_size=output_size,
                  sampling_ratio=sampling_ratio, aligned=aligned,
                  min_level=min_level, interpret=interpret)
        parts = []
        if bsz > 1:
            # images are independent: recurse over batch chunks (same SMEM
            # scalar-prefetch bound as the forward kernel)
            img_chunk = max(1, MAX_ROIS_PER_LAUNCH // n)
            for s in range(0, bsz, img_chunk):
                e = min(s + img_chunk, bsz)
                shapes_c = [(e - s,) + tuple(sh[1:]) for sh in feat_shapes]
                parts.append(multilevel_roi_align_adjoint_pallas(
                    g[s:e], boxes[s:e], shapes_c,
                    valid=None if valid is None else valid[s:e], **kw))
            return [jnp.concatenate([pt[l] for pt in parts], axis=0)
                    for l in range(len(feat_shapes))]
        # single image with an oversized ROI set: the gradient is a SUM
        # over ROIs, so chunk the ROI axis and add the per-chunk grads
        # (mirrors the forward's ROI-axis split, which concatenates)
        for s in range(0, n, MAX_ROIS_PER_LAUNCH):
            e = min(s + MAX_ROIS_PER_LAUNCH, n)
            parts.append(multilevel_roi_align_adjoint_pallas(
                g[:, s:e], boxes[:, s:e], feat_shapes,
                valid=None if valid is None else valid[:, s:e], **kw))
        return [sum(pt[l] for pt in parts)
                for l in range(len(feat_shapes))]

    shape_stubs = [jax.ShapeDtypeStruct(tuple(sh), jnp.float32)
                   for sh in feat_shapes]
    pr = _prepare(shape_stubs, boxes, strides=strides,
                  output_size=output_size, sampling_ratio=sampling_ratio,
                  aligned=aligned, min_level=min_level, valid=valid,
                  pad_features=False)
    hp, wp = pr["hp"], pr["wp"]

    group = ADJ_GROUP
    n_pad = ((n + group - 1) // group) * group
    n_groups = n_pad // group

    def pad_n(a, fill=0):
        """(B*N, ...) -> (B*Npad, ...) padded PER IMAGE (b-major layout)."""
        a = a.reshape((bsz, n) + a.shape[1:])
        if n_pad != n:
            widths = [(0, 0), (0, n_pad - n)] + [(0, 0)] * (a.ndim - 2)
            a = jnp.pad(a, widths, constant_values=fill)
        return a.reshape((bsz * n_pad,) + a.shape[2:])

    levels = pad_n(pr["levels"])
    y0 = pad_n(pr["y0"])
    x0 = pad_n(pr["x0"])
    nty = pad_n(pr["nty"])          # padded ROIs: 0 tiles -> fully skipped
    ntx = pad_n(pr["ntx"], fill=1)
    ry = pad_n(pr["ry"])
    rx = pad_n(pr["rx"])
    g_flat = pad_n(g.astype(jnp.float32).reshape(bsz * n, p, p, c))

    # channel blocks: split so the largest per-level accumulator fits.
    # Splitting below 128 lanes wastes lane bandwidth but keeps inputs
    # larger than the shipped 480x640 compiling (e.g. 640x864 -> p2
    # accumulator 17.7MB at 128 channels); floor at 32 to bound the waste.
    cpass = c
    while (cpass > 32 and cpass % 2 == 0 and
           int(max(hp[l] * wp[l] for l in range(len(feat_shapes))))
           * cpass * 4 > _ADJ_VMEM_BUDGET):
        cpass //= 2
    n_cblocks = c // cpass
    assert cpass * n_cblocks == c, (c, cpass)

    # pack levels into launches under the accumulator budget
    acc_bytes = [int(hp[l]) * int(wp[l]) * cpass * 4
                 for l in range(len(feat_shapes))]
    launches, cur, cur_bytes = [], [], 0
    for l in range(len(feat_shapes)):
        if cur and cur_bytes + acc_bytes[l] > _ADJ_VMEM_BUDGET:
            launches.append(tuple(cur))
            cur, cur_bytes = [], 0
        cur.append(l)
        cur_bytes += acc_bytes[l]
    if cur:
        launches.append(tuple(cur))

    grads_padded = [[] for _ in feat_shapes]   # per level: channel blocks
    for lvl_ids in launches:
        for ci in range(n_cblocks):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(bsz, n_groups),
                in_specs=[
                    pl.BlockSpec((group, p, p, cpass),
                                 lambda b, k, *_, ci=ci, ng=n_groups:
                                 (b * ng + k, 0, 0, ci),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((group, N_TILES, p, TILE_Y),
                                 lambda b, k, *_, ng=n_groups:
                                 (b * ng + k, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((group, N_TILES, p, TILE_X),
                                 lambda b, k, *_, ng=n_groups:
                                 (b * ng + k, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY)
                    for _ in lvl_ids
                ],
                scratch_shapes=(
                    [pltpu.VMEM((int(hp[l]), int(wp[l]), cpass), jnp.float32)
                     for l in lvl_ids]
                    + [pltpu.SemaphoreType.DMA] * len(lvl_ids)
                ),
            )
            outs = pl.pallas_call(
                _adjoint_kernel_factory(lvl_ids, group, p, cpass),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct(
                    (bsz, int(hp[l]), int(wp[l]), cpass), jnp.float32)
                    for l in lvl_ids],
                interpret=interpret,
            )(levels, y0, x0, nty, ntx, g_flat, ry, rx)
            for oi, l in enumerate(lvl_ids):
                grads_padded[l].append(outs[oi])

    grads = []
    for l, sh in enumerate(feat_shapes):
        gl = (grads_padded[l][0] if n_cblocks == 1
              else jnp.concatenate(grads_padded[l], axis=-1))
        grads.append(gl[:, :int(sh[1]), :int(sh[2]), :])
    return grads


# --------------------------------------------------------------------------- #
# training pooler: Pallas forward + reference-exact transposed backward
# --------------------------------------------------------------------------- #
# Static call options, hashable for custom_vjp's nondiff_argnums.  Feature
# shapes/dtypes ride along so the backward can rebuild the linear map's
# input avals without holding the (large) feature arrays as residuals.
_TrainPoolOpts = collections.namedtuple(
    "_TrainPoolOpts",
    ["strides", "output_size", "sampling_ratio", "aligned", "min_level",
     "chunk", "use_pallas", "shapes", "dtypes", "adjoint_impl",
     "interpret"])


def _xla_batched(features, boxes, opts: _TrainPoolOpts) -> jnp.ndarray:
    """vmapped XLA gather formulation — linear in `features` for fixed boxes
    (gathers + bilinear weights + bin averaging), so it linear-transposes."""

    def per_image(feats, bxs):
        return multilevel_roi_align(
            list(feats), bxs, strides=opts.strides,
            output_size=opts.output_size,
            sampling_ratio=opts.sampling_ratio, aligned=opts.aligned,
            min_level=opts.min_level, chunk=opts.chunk)

    return jax.vmap(per_image)(tuple(features), boxes).astype(jnp.float32)


def _train_levels(boxes_flat: jnp.ndarray, opts: _TrainPoolOpts):
    """(T,) 0-based level idx of the training pooler's ACTUAL forward."""
    return pallas_level_idx(
        boxes_flat, n_levels=len(opts.shapes), strides=opts.strides,
        output_size=opts.output_size, sampling_ratio=opts.sampling_ratio,
        aligned=opts.aligned, min_level=opts.min_level)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _train_pool(features, boxes, valid, opts: _TrainPoolOpts) -> jnp.ndarray:
    if opts.use_pallas:
        return multilevel_roi_align_pallas(
            list(features), boxes, strides=opts.strides,
            output_size=opts.output_size,
            sampling_ratio=opts.sampling_ratio, aligned=opts.aligned,
            min_level=opts.min_level, interpret=opts.interpret,
            valid=None if valid is None else valid > 0.5)
    out = _xla_batched(features, boxes, opts)
    if valid is not None:
        # match the Pallas forward's contract: invalid ROIs pool to zeros
        out = jnp.where((valid > 0.5)[..., None, None, None], out, 0.0)
    return out


def _train_pool_fwd(features, boxes, valid, opts):
    # residuals: ONLY boxes (+ the tiny valid mask) — the backward is a
    # fresh evaluation of the transposed linear map, no forward
    # intermediates are kept (this is what lets the Pallas forward replace
    # the gather forward without paying its memory back at backward time)
    return _train_pool(features, boxes, valid, opts), (boxes, valid)


def _train_pool_bwd(opts, res, g):
    boxes, valid = res
    per_image_shapes = tuple(s[1:] for s in opts.shapes)
    if valid is not None:
        # forward zeroed invalid ROIs, so their cotangent rows contribute
        # nothing to the feature gradient
        g = jnp.where((valid > 0.5)[..., None, None, None], g, 0.0)
    bsz, n = boxes.shape[:2]
    if opts.use_pallas and opts.adjoint_impl != "xla":
        # Pallas adjoint kernel: the exact transpose of the Pallas forward
        # (same Ry/Rx separable weights, window-accumulated in VMEM) —
        # replaces the XLA per-corner scatter tree that dominated
        # trainable-trunk training steps
        dfeats = multilevel_roi_align_adjoint_pallas(
            g, boxes, opts.shapes, strides=opts.strides,
            output_size=opts.output_size,
            sampling_ratio=opts.sampling_ratio, aligned=opts.aligned,
            min_level=opts.min_level, interpret=opts.interpret,
            valid=None if valid is None else valid > 0.5)
    else:
        if opts.use_pallas:
            # scatter to the level the Pallas forward READ: the d2
            # assignment plus the window-overflow bump
            # (`pallas_level_idx`), so the forward/backward pair stays an
            # exact linear map + transpose even for out-of-contract
            # (>5:1 aspect at max level size) ROIs
            lvls = _train_levels(boxes.reshape(bsz * n, 4),
                                 opts).reshape(bsz, n)
        else:
            lvls = jnp.zeros((bsz, n), jnp.int32)  # unused placeholder

        def per_image(g_i, bx_i, lv_i):
            return multilevel_roi_align_adjoint(
                g_i, bx_i, per_image_shapes, strides=opts.strides,
                output_size=opts.output_size,
                sampling_ratio=opts.sampling_ratio,
                aligned=opts.aligned, min_level=opts.min_level,
                chunk=opts.chunk,
                level_idx=lv_i if opts.use_pallas else None)

        dfeats = jax.vmap(per_image)(g, boxes, lvls)  # list (B, H, W, C) f32
    dfeats = tuple(d.astype(jnp.dtype(t))
                   for d, t in zip(dfeats, opts.dtypes))
    # ZERO cotangent for boxes: d2 parity — proposals are created under
    # torch.no_grad and `_pool` structurally stop_gradients ROI boxes, so no
    # caller ever differentiates through coordinates.  (Returning the true
    # coordinate gradient would re-materialize the per-corner sample tensors
    # this pooler exists to avoid.)
    dvalid = None if valid is None else jnp.zeros_like(valid)
    return dfeats, jnp.zeros_like(boxes), dvalid


_train_pool.defvjp(_train_pool_fwd, _train_pool_bwd)


def multilevel_roi_align_train(features: Sequence[jnp.ndarray],
                               boxes: jnp.ndarray, *,
                               strides: Sequence[int], output_size: int,
                               sampling_ratio: int, aligned: bool,
                               min_level: int = 2, chunk: int = 32,
                               use_pallas: bool = True,
                               adjoint_impl: str = "auto",
                               valid: jnp.ndarray | None = None,
                               interpret: bool = False) -> jnp.ndarray:
    """Batched FPN ROIAlign for TRAINING: features (B, H_l, W_l, C) x L,
    boxes (B, N, 4) -> (B, N, P, P, C) float32.

    Forward: the Pallas window-DMA kernel (`use_pallas=True`, TPU) or the
    XLA gather formulation (CPU / forced).  Backward with the Pallas
    forward (`adjoint_impl="auto"`): the Pallas ADJOINT kernel
    (`multilevel_roi_align_adjoint_pallas`) — the exact transpose of the
    forward's separable matmuls, window-accumulated in VMEM; it reuses the
    forward's own Ry/Rx weights, so forward/backward form an exact
    linear-map/transpose pair for ALL ROIs including out-of-contract
    >5:1-aspect ones (tested in
    `tests/test_roi_train_pool.py::test_out_of_contract_roi_gradient`).
    `adjoint_impl="xla"` (and the XLA forward) instead use the
    hand-written adjoint of the gather formulation
    (`multilevel_roi_align_adjoint`) — the same corner-weight scatter
    torchvision `roi_align`'s CUDA backward computes (reference pooler
    contract: `modeling/roi_heads/roi_heads.py:50-55`), with the kernel's
    own level assignment recomputed via `pallas_level_idx`.

    `valid` (B, N) bool, optional: invalid (padded / unsampled) ROIs pool to
    zeros at zero kernel cost and contribute nothing to the feature
    gradient.

    `boxes` receive a ZERO cotangent (see `_train_pool_bwd`); callers must
    not rely on coordinate gradients (`PlaneRCNN._pool` stop_gradients them
    structurally).
    """
    opts = _TrainPoolOpts(
        strides=tuple(int(s) for s in strides), output_size=int(output_size),
        sampling_ratio=int(sampling_ratio), aligned=bool(aligned),
        min_level=int(min_level), chunk=int(chunk),
        use_pallas=bool(use_pallas),
        shapes=tuple(tuple(f.shape) for f in features),
        dtypes=tuple(str(f.dtype) for f in features),
        adjoint_impl=str(adjoint_impl), interpret=bool(interpret))
    valid_f = None if valid is None else valid.astype(jnp.float32)
    return _train_pool(tuple(features), boxes, valid_f, opts)
