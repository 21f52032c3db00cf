"""Fixed-shape NMS for TPU.

Replaces the torchvision CUDA `nms` / detectron2 `batched_nms` used by the
reference's RPN and FastRCNN inference (`config/config.yaml:222,291`).
Exact greedy semantics: boxes are processed in descending score order; a box
is suppressed iff it overlaps an earlier *kept* box with IoU > threshold.

The whole thing is one jittable program: an (N, N) IoU matrix plus a
`lax.fori_loop` over rows updating a keep mask — no dynamic shapes, no host
sync.  N is the static padded capacity; invalid entries carry score -inf and
never suppress anything.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .box_ops import pairwise_iou

NEG_INF = -1e10


def _sort_top_k(x: jnp.ndarray, k: int):
    """Stable-sort top-k: partitions cleanly under the SPMD partitioner and
    breaks ties identically to `lax.top_k` (lowest index first)."""
    dim = x.ndim - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, dim)
    neg_vals, idx = jax.lax.sort_key_val(-x, iota, dimension=dim)
    take = lambda a: jax.lax.slice_in_dim(a, 0, k, axis=dim)
    return -take(neg_vals), take(idx)


def _under_multidevice_mesh() -> bool:
    """True when tracing under a >1-device mesh (pjit `with mesh:` context or
    the newer abstract-mesh context)."""
    try:
        import warnings
        with warnings.catch_warnings():
            # legacy accessor for the `with mesh:` context; deprecated in
            # jax 0.8.2 but still the only view of the physical-mesh context
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla
            m = pxla.thread_resources.env.physical_mesh
        if m is not None and not m.empty and m.size > 1:
            return True
    except Exception:
        pass
    try:
        m = jax.sharding.get_abstract_mesh()
        return m is not None and not m.empty and m.size > 1
    except Exception:
        return False


def top_k(x: jnp.ndarray, k: int):
    """`lax.top_k` with an SPMD-partitionable lowering where it matters.

    XLA lowers `lax.top_k` to a TopK custom-call the SPMD partitioner cannot
    shard: under a batch-sharded mesh every call all-gathers its operand and
    runs replicated — and each such collective is a rendezvous barrier that
    dominates virtual-device CPU execution (the multi-chip tests / dryrun)
    and costs an ICI round-trip on real multi-chip TPU.  So:

      * tracing under a >1-device mesh -> always the sort form (partitions);
      * otherwise pick per lowering platform (`lax.platform_dependent`, NOT
        the process-global `jax.default_backend()`): the TPU custom-call is
        faster than a full sort on the long RPN score vectors and the
        single-chip serving path never partitions it; every other platform
        gets the sort form.
    """
    if _under_multidevice_mesh():
        return _sort_top_k(x, k)
    return jax.lax.platform_dependent(
        x,
        tpu=lambda v: tuple(jax.lax.top_k(v, k)),
        default=lambda v: _sort_top_k(v, k))


NMS_TILE = 32  # rows per serial step; a multiple of the 8-sublane register


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS. Returns a bool keep mask aligned with the *input* order.

    Exact greedy semantics, but tiled so the serial chain is N/32 loop steps
    instead of N: a row-per-iteration `fori_loop` costs ~5us of while-loop
    overhead per row on TPU (the RPN's 5 levels x 1000 rows + FastRCNN's
    2000 alone were ~35ms of the 108 f/s round-1 profile).  Each tile step
    resolves its 32 rows' mutual suppression with an unrolled data-flow
    chain on (32,)-vectors, then suppresses all later rows with ONE
    vectorized (32, N) reduction.

    Args:
      boxes: (N, 4) XYXY.
      scores: (N,).
      valid: (N,) bool — padded entries must be False.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)  # descending, stable
    sboxes = boxes[order]
    svalid = valid[order]

    t = min(NMS_TILE, n)
    n_pad = ((n + t - 1) // t) * t
    if n_pad != n:
        sboxes = jnp.concatenate(
            [sboxes, jnp.zeros((n_pad - n, 4), sboxes.dtype)])
        svalid = jnp.concatenate([svalid, jnp.zeros((n_pad - n,), bool)])

    iou = pairwise_iou(sboxes, sboxes)
    sup = iou > iou_threshold
    col_ids = jnp.arange(n_pad)

    def tile_body(k, keep):
        base = k * t
        # suppression rows of this tile against everything: (t, n_pad)
        rows = jax.lax.dynamic_slice(sup, (base, 0), (t, n_pad))
        live = jax.lax.dynamic_slice(keep, (base,), (t,))
        # within-tile greedy chain, unrolled: row j survives iff no earlier
        # surviving row in the tile suppresses it (earlier tiles are already
        # folded into `keep`)
        tile_cols = jax.lax.dynamic_slice(
            rows, (0, base), (t, t))                       # (t, t) sup blk
        live_rows = []
        for j in range(t):
            lj = live[j]
            for i in range(j):
                lj &= ~(live_rows[i] & tile_cols[i, j])
            live_rows.append(lj)
        live = jnp.stack(live_rows)                        # (t,)
        # one vectorized pass: kill every later row suppressed by a
        # surviving tile row
        later = col_ids[None, :] > (base + jnp.arange(t))[:, None]
        killed = jnp.any(live[:, None] & rows & later, axis=0)
        keep = jax.lax.dynamic_update_slice(keep, live, (base,))
        return keep & ~killed

    keep_sorted = jax.lax.fori_loop(0, n_pad // t, tile_body, svalid)[:n]
    # scatter back to input order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     classes: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Class-wise NMS via the coordinate-offset trick (detectron2 batched_nms)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, valid, iou_threshold)


def select_top(scores: jnp.ndarray, keep: jnp.ndarray, k: int):
    """Pick the top-k kept entries by score.

    Returns (indices (k,), valid (k,)): indices into the input arrays, ordered
    by descending score; `valid[i]` False where fewer than k survive.
    """
    masked = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = top_k(masked, k)
    return idx, top_scores > NEG_INF / 2
