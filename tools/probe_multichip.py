"""Diagnose where the 8-virtual-device dryrun's wall time goes.

Phases (each timed separately, persistent-cache friendly):
  1. trivial: shard_map psum of a 46M-element vector (the gradient-sync
     pattern alone);
  2. nosync:  the full train step WITHOUT the gradient psum (pure 8-thread
     thunk scheduling cost);
  3. full:    the real `make_sharded_train_step` (what the dryrun runs).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS="--xla_force_host_platform_device_count=8 ..." \
      python tools/probe_multichip.py [phase ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.sharding import PartitionSpec as P


def _mesh():
    from articulation3d_tpu.parallel import make_mesh
    return make_mesh(jax.devices()[:8])


def _shard_map():
    try:
        return jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map
        return shard_map


def phase_trivial():
    mesh = _mesh()
    n = 46_000_000

    def f(x):
        return jax.lax.psum(x * 2.0, "data") / 8.0

    fn = jax.jit(_shard_map()(f, mesh=mesh, in_specs=P(), out_specs=P(),
                              check_vma=False))
    x = jnp.ones((n,), jnp.float32)
    t = time.time()
    fn(x).block_until_ready()
    print(f"trivial psum 46M f32: compile+run {time.time() - t:.1f}s",
          flush=True)
    t = time.time()
    fn(x).block_until_ready()
    print(f"trivial psum 46M f32: run {time.time() - t:.1f}s", flush=True)


def _dryrun_pieces():
    import __graft_entry__ as g
    from articulation3d_tpu.train.optimizer import build_optimizer
    from articulation3d_tpu.train.train_step import create_train_state

    cfg = g._tiny_config(train=True)
    rng = jax.random.PRNGKey(0)
    model, state = create_train_state(cfg, rng)
    tx = build_optimizer(cfg, state.params)
    b, h, w, gi = 8, cfg.input.height, cfg.input.width, 2
    rs = np.random.RandomState(0)
    masks = np.zeros((b, gi, h, w), np.float32)
    masks[:, :, 10:30, 15:45] = 1.0
    batch = {
        # RAW pixel domain (compute_losses normalizes on device)
        "images": rs.randint(0, 256, (b, h, w, 3)).astype(np.uint8),
        "gt_boxes": np.tile(np.asarray([[15, 10, 45, 30]], np.float32),
                            (b, gi, 1)),
        "gt_classes": rs.randint(0, 2, (b, gi)).astype(np.int32),
        "gt_valid": np.tile(np.asarray([True, True]), (b, 1)),
        "gt_masks": masks,
        "gt_planes": np.tile(np.asarray([0.0, 0.0, 1.0], np.float32),
                             (b, gi, 1)),
        "gt_rot_axis": np.tile(np.asarray([0.6, 0.8, 0.1, 1.0], np.float32),
                               (b, gi, 1)),
        "gt_tran_axis": np.tile(np.asarray([0.6, 0.8, 0.0, 1.0], np.float32),
                                (b, gi, 1)),
        "gt_depth": np.abs(rs.randn(b, cfg.model.depth_head.output_height,
                                    cfg.model.depth_head.output_width)
                           ).astype(np.float32),
    }
    return cfg, model, state, tx, batch


def phase_nosync():
    """Per-device fwd+bwd+update with NO cross-device collective."""
    import optax
    from articulation3d_tpu.parallel import replicate, shard_batch
    from articulation3d_tpu.train.train_step import TrainState, compute_losses

    cfg, model, state, tx, batch = _dryrun_pieces()
    mesh = _mesh()

    def local_step(state, batch, key):
        keys = jax.random.split(key, batch["images"].shape[0])

        def loss_fn(params):
            losses, new_stats = compute_losses(
                model, params, state.batch_stats, batch, keys, cfg)
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), total

    step = jax.jit(_shard_map()(
        local_step, mesh=_mesh(),
        in_specs=(P(), P("data"), P()), out_specs=(P(), P()),
        check_vma=False), donate_argnums=(0,))

    with mesh:
        state = replicate(mesh, state)
        db = shard_batch(mesh, batch)
        key = replicate(mesh, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
        t = time.time()
        compiled = step.lower(state, db, key).compile()
        print(f"nosync: compiled {time.time() - t:.1f}s", flush=True)
        t = time.time()
        new_state, total = compiled(state, db, key)
        jax.block_until_ready(new_state.params)
        print(f"nosync: executed {time.time() - t:.1f}s "
              f"(loss {np.mean(np.asarray(total)):.3f})", flush=True)


def phase_full(donate=True):
    from articulation3d_tpu.parallel import replicate, shard_batch
    from articulation3d_tpu.train.train_step import make_sharded_train_step

    cfg, model, state, tx, batch = _dryrun_pieces()
    mesh = _mesh()
    train_step = make_sharded_train_step(cfg, model, tx, mesh)
    with mesh:
        state = replicate(mesh, state)
        db = shard_batch(mesh, batch)
        key = replicate(mesh, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
        step = (jax.jit(train_step, donate_argnums=(0,)) if donate
                else jax.jit(train_step))
        t = time.time()
        compiled = step.lower(state, db, key).compile()
        print(f"full: compiled {time.time() - t:.1f}s", flush=True)
        t = time.time()
        new_state, metrics = compiled(state, db, key)
        jax.block_until_ready(new_state.params)
        print(f"full: executed {time.time() - t:.1f}s "
              f"(total_loss {float(metrics['total_loss']):.3f})", flush=True)


def phase_bisect():
    """Compile+run increasing scopes of the train step on the 8-dev mesh."""
    from articulation3d_tpu.models.planercnn import PlaneRCNN
    from articulation3d_tpu.parallel import replicate, shard_batch
    from articulation3d_tpu.train.train_step import compute_losses

    cfg, model, state, tx, batch = _dryrun_pieces()
    mesh = _mesh()
    smap = _shard_map()

    def run(name, fn, out_specs, *args):
        f = jax.jit(smap(fn, mesh=mesh,
                         in_specs=tuple(P("data") if isinstance(a, dict)
                                        else P() for a in args),
                         out_specs=out_specs, check_vma=False))
        t = time.time()
        c = f.lower(*args).compile()
        print(f"{name}: compiled {time.time()-t:.1f}s", flush=True)
        t = time.time()
        jax.block_until_ready(c(*args))
        print(f"{name}: run {time.time()-t:.2f}s", flush=True)

    params, stats = state.params, state.batch_stats
    key = jax.random.PRNGKey(1)

    def fwd_only(batch):
        (outputs, rois), _ = model.apply(
            {"params": params, "batch_stats": stats},
            batch["images"].astype(jnp.float32),
            batch["gt_boxes"], batch["gt_classes"],
            batch["gt_valid"], jax.random.split(key, batch["images"].shape[0]),
            method=PlaneRCNN.train_forward, mutable=["batch_stats"])
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(outputs))

    def losses_fwd(batch):
        losses, _ = compute_losses(model, params, stats, batch, key, cfg)
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    def losses_grad(batch):
        def loss_fn(p):
            losses, _ = compute_losses(model, p, stats, batch, key, cfg)
            return sum(jnp.asarray(v, jnp.float32) for v in losses.values())
        l, g = jax.value_and_grad(loss_fn)(params)
        return l

    with mesh:
        db = shard_batch(mesh, batch)
        run("bisect fwd_only", fwd_only, P(), db)
        run("bisect losses_fwd", losses_fwd, P(), db)
        run("bisect losses_grad", losses_grad, P(), db)


def phase_bisect2():
    """losses_grad + {ravel/psum | optax} separately."""
    import optax
    from jax.flatten_util import ravel_pytree
    from articulation3d_tpu.parallel import shard_batch
    from articulation3d_tpu.train.train_step import compute_losses

    cfg, model, state, tx, batch = _dryrun_pieces()
    mesh = _mesh()
    smap = _shard_map()
    params, stats, opt_state = state.params, state.batch_stats, state.opt_state
    key = jax.random.PRNGKey(1)

    def run(name, fn, *args):
        f = jax.jit(smap(fn, mesh=mesh,
                         in_specs=tuple(P("data") if isinstance(a, dict) and
                                        "images" in a else P() for a in args),
                         out_specs=P(), check_vma=False))
        t = time.time()
        c = f.lower(*args).compile()
        print(f"{name}: compiled {time.time()-t:.1f}s", flush=True)
        t = time.time()
        jax.block_until_ready(c(*args))
        print(f"{name}: run {time.time()-t:.2f}s", flush=True)

    def loss_fn(p, batch):
        losses, new_stats = compute_losses(model, p, stats, batch, key, cfg)
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values()), (
            losses, new_stats)

    def grad_psum(batch):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        flat, unravel = ravel_pytree(g)
        flat = jax.lax.psum(flat, "data") / 8.0
        g = unravel(flat)
        return l + sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))

    def grad_optax(batch):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, _ = tx.update(g, opt_state, params)
        new_p = optax.apply_updates(params, updates)
        return l + sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(new_p))

    with mesh:
        db = shard_batch(mesh, batch)
        run("bisect2 grad_psum", grad_psum, db)
        run("bisect2 grad_optax", grad_optax, db)


def phase_single():
    """Same tiny step, ONE device, batch 1: the per-device compute floor."""
    from articulation3d_tpu.train.train_step import make_train_step

    cfg, model, state, tx, batch = _dryrun_pieces()
    batch = {k: v[:1] for k, v in batch.items()}
    step = jax.jit(make_train_step(cfg, model, tx))
    key = jax.random.PRNGKey(1)
    t = time.time()
    compiled = step.lower(state, batch, key).compile()
    print(f"single b=1: compiled {time.time() - t:.1f}s", flush=True)
    for i in range(2):
        t = time.time()
        new_state, metrics = compiled(state, batch, key)
        jax.block_until_ready(new_state.params)
        print(f"single b=1: executed {time.time() - t:.1f}s "
              f"(total {float(metrics['total_loss']):.3f})", flush=True)


def phase_full_nodonate():
    phase_full(donate=False)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["trivial", "nosync", "full"]
    for p in phases:
        globals()[f"phase_{p}"]()
