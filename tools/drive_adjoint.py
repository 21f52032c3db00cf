"""On-chip drive for the Pallas ADJOINT kernel (training pooler backward).

Parity: `multilevel_roi_align_adjoint_pallas` must match the XLA
corner-scatter adjoint (`multilevel_roi_align_adjoint` at the kernel's own
level assignment) — both realize the transpose of the same linear map, so
they agree up to f32 accumulation order.

Perf: micro-bench both adjoints plus the full value_and_grad through
`multilevel_roi_align_train` with each `adjoint_impl`, at the stage-1
training shape (ims/batch 16 x 512 sampled ROIs, C=256, 480x640 pyramid).

Usage: python tools/drive_adjoint.py [--ims 16] [--rois 512] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STRIDES = (4, 8, 16, 32)
SHAPES = [(120, 160), (60, 80), (30, 40), (15, 20)]   # 480x640 pyramid


def _time(fn, args, steps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    leaf = None
    for _ in range(steps):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jnp.sum(leaf)))      # host-readback sync
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ims", type=int, default=16)
    ap.add_argument("--rois", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from articulation3d_tpu.ops.roi_align import multilevel_roi_align_adjoint
    from articulation3d_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_adjoint_pallas, multilevel_roi_align_train,
        pallas_level_idx)

    print(f"# backend {jax.default_backend()}", flush=True)
    rs = np.random.RandomState(0)
    b, n, c, p = args.ims, args.rois, 256, 7
    dev = jax.devices()[0]
    feats = [jax.device_put(jnp.asarray(
        rs.randn(b, h, w, c) * 0.1, jnp.float32), dev) for h, w in SHAPES]
    shapes = [f.shape for f in feats]
    sizes = rs.uniform(16, 400, (b, n, 1))
    x1 = rs.uniform(0, 600, (b, n, 1))
    y1 = rs.uniform(0, 440, (b, n, 1))
    boxes = jax.device_put(jnp.asarray(np.concatenate(
        [x1, y1, np.minimum(x1 + sizes, 640),
         np.minimum(y1 + sizes * 0.7, 480)], 2), jnp.float32), dev)
    g = jax.device_put(jnp.asarray(rs.randn(b, n, p, p, c), jnp.float32), dev)
    jax.block_until_ready((feats, boxes, g))
    kw = dict(strides=STRIDES, output_size=p, sampling_ratio=0, aligned=True)

    # ---- parity ---------------------------------------------------------- #
    pallas_fn = jax.jit(lambda gg, bb: multilevel_roi_align_adjoint_pallas(
        gg, bb, shapes, **kw))

    def xla_fn(gg, bb):
        lvl = pallas_level_idx(bb.reshape(-1, 4), n_levels=4, strides=STRIDES,
                               output_size=p, sampling_ratio=0,
                               aligned=True).reshape(b, n)
        per_shapes = [s[1:] for s in shapes]
        return jax.vmap(lambda gi, bi, li: multilevel_roi_align_adjoint(
            gi, bi, per_shapes, level_idx=li, chunk=32, **kw))(gg, bb, lvl)

    xla_jit = jax.jit(xla_fn)
    got = pallas_fn(g, boxes)
    want = xla_jit(g, boxes)
    for l, (ga, gw) in enumerate(zip(got, want)):
        err = float(jnp.max(jnp.abs(ga - gw)))
        rel = err / max(float(jnp.max(jnp.abs(gw))), 1e-9)
        print(f"# adjoint parity p{l + 2}: max abs {err:.2e} (rel {rel:.2e})",
              flush=True)
        assert rel < 1e-4, (l, err, rel)

    # ---- micro-bench ------------------------------------------------------ #
    dt_p = _time(pallas_fn, (g, boxes), args.steps)
    dt_x = _time(xla_jit, (g, boxes), args.steps)
    print(f"# adjoint only ({b}x{n} ROIs, C={c}): pallas {dt_p*1000:.1f} ms, "
          f"xla scatter {dt_x*1000:.1f} ms ({dt_x/dt_p:.1f}x)", flush=True)

    # ---- full train-pool value_and_grad ----------------------------------- #
    bf = [f.astype(jnp.bfloat16) for f in feats]
    for impl in ("pallas", "xla"):
        fn = jax.jit(jax.grad(lambda fs: jnp.sum(jnp.abs(
            multilevel_roi_align_train(fs, boxes, adjoint_impl=impl, **kw)))))
        dt = _time(fn, (tuple(bf),), args.steps)
        print(f"# train pool fwd+bwd [{impl} adjoint]: {dt*1000:.1f} ms",
              flush=True)
    print("ADJOINT_DRIVE_OK", flush=True)


if __name__ == "__main__":
    main()
