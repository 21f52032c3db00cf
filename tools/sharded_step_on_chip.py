"""Run the PRODUCTION `make_sharded_train_step` on the real TPU chip.

VERDICT r3 #3: the multichip dryrun proves sharded-training semantics on a
CPU mesh; this proves the SAME sharded program — shard_map over a
`jax.sharding.Mesh`, fused trainable-only grad psum, bf16 grad compression
— lowers, compiles and EXECUTES on real TPU hardware, at full production
capacity (stage-3 recipe, 480x640, ims/batch 8), over however many chips
are attached (a 1-device mesh on this environment's single v5e; the psum
degenerates to identity but the sharded lowering path is identical).

Usage:  python tools/sharded_step_on_chip.py [--stage 3] [--ims 8] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", type=int, default=3, choices=(1, 3))
    ap.add_argument("--ims", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from train_on_chip import _batch, _config

    from articulation3d_tpu.parallel import batch_sharding, make_mesh, replicate
    from articulation3d_tpu.train.optimizer import build_optimizer
    from articulation3d_tpu.train.train_step import (create_train_state,
                                                     make_sharded_train_step)

    cfg = _config(args.stage, args.ims, 480, 640)
    devs = jax.devices()
    mesh = make_mesh(devs)
    print(f"# backend {jax.default_backend()}, mesh {mesh.shape} over "
          f"{[str(d) for d in devs]}", flush=True)

    t0 = time.time()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, state.params)
    step = jax.jit(make_sharded_train_step(cfg, model, tx, mesh),
                   donate_argnums=(0,))
    state = replicate(mesh, state)
    batch = jax.device_put(_batch(cfg, args.ims), batch_sharding(mesh))
    key = replicate(mesh, jax.random.PRNGKey(42))
    jax.block_until_ready(batch)
    print(f"# init + placement {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    state, metrics = step(state, batch, key)
    first = float(np.asarray(metrics["total_loss"].addressable_shards[0].data))
    print(f"# compile + first sharded step {time.time() - t0:.1f}s, "
          f"total_loss {first:.4f}", flush=True)
    assert np.isfinite(first)

    t0 = time.time()
    last = first
    for i in range(2, args.steps + 1):
        state, metrics = step(state, batch, key)
        last = float(np.asarray(
            metrics["total_loss"].addressable_shards[0].data))
    dt = (time.time() - t0) / max(args.steps - 1, 1)
    print(f"# sharded step on TPU: {dt*1000:.1f} ms/step (incl readback), "
          f"losses {sorted(metrics)}", flush=True)
    print(f"# total_loss {first:.4f} -> {last:.4f} over {args.steps} steps",
          flush=True)
    assert np.isfinite(last) and last < first
    print("SHARDED_STEP_ON_CHIP_OK", flush=True)


if __name__ == "__main__":
    main()
