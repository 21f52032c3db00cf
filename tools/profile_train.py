"""Stage-level TRAINING-step profile on the real chip.

Times nested prefixes of the stage-1 training program (feature fwd, feature
fwd+bwd, +rpn, loss fwd, full value_and_grad step) plus the training pooler
in isolation (fwd and fwd+bwd, Pallas vs XLA forward), so step-time is
attributable to stages the way PROFILE.md's inference table is.

Usage:  python tools/profile_train.py [--stage 1] [--ims 16] [--steps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
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


def _time_fn(fn, args, steps: int) -> float:
    float(np.asarray(fn(*args)))      # compile + first transfer
    float(np.asarray(fn(*args)))      # warm
    t0 = time.time()
    for _ in range(steps):
        float(np.asarray(fn(*args)))
    return (time.time() - t0) / steps


def main():  # noqa: C901
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", type=int, default=1, choices=(1, 3))
    ap.add_argument("--ims", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from train_on_chip import _batch, _config

    from articulation3d_tpu.models import PlaneRCNN, init_params
    from articulation3d_tpu.train.optimizer import build_optimizer
    from articulation3d_tpu.train.train_step import (TrainState,
                                                     compute_losses,
                                                     make_train_step)

    cfg = _config(args.stage, args.ims, 480, 640)
    dev = jax.devices()[0]
    print(f"# backend {jax.default_backend()}, stage {args.stage}, "
          f"ims {args.ims}", flush=True)

    init_cfg = cfg.replace(
        input=dataclasses.replace(cfg.input, height=128, width=160),
        model=dataclasses.replace(
            cfg.model, roi_pooler_impl="xla",
            depth_head=dataclasses.replace(cfg.model.depth_head,
                                           output_height=128,
                                           output_width=160)))
    with jax.default_device(jax.devices("cpu")[0]):
        _, variables = init_params(init_cfg, jax.random.PRNGKey(0))
    params = jax.device_put(variables["params"], dev)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), dev)
    jax.block_until_ready(params)

    batch = jax.device_put(_batch(cfg, args.ims), dev)
    key = jax.device_put(jax.random.PRNGKey(42), dev)
    jax.block_until_ready(batch)
    # feature-stage rows consume the model-domain (normalized f32) images;
    # the full-step rows feed raw uint8 and normalize inside the step
    imgs_f = jax.jit(lambda im: (
        (im.astype(jnp.float32) - jnp.asarray(cfg.input.pixel_mean))
        / jnp.asarray(cfg.input.pixel_std)))(batch["images"])
    jax.block_until_ready(imgs_f)

    model = PlaneRCNN(cfg)
    h, w = cfg.input.height, cfg.input.width
    rows = []

    def _reduce(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.asarray(x, jnp.float32).sum(), tree, 0.0)

    def stage(name, fn, fn_args):
        try:
            dt = _time_fn(jax.jit(fn), fn_args, args.steps)
        except Exception as e:
            print(f"{name:<36} FAILED: {type(e).__name__}: {e}", flush=True)
            return
        rows.append((name, dt * 1000))
        print(f"{name:<36} {dt*1000:9.1f} ms/step", flush=True)

    # -- prefixes of the training program -----------------------------------
    stage("features fwd", lambda p, im: _reduce(model.apply(
        {"params": p, "batch_stats": batch_stats}, im,
        method=PlaneRCNN.features)), (params, imgs_f))

    def feat_grad(p, im):
        return _reduce(jax.grad(lambda pp: _reduce(model.apply(
            {"params": pp, "batch_stats": batch_stats}, im,
            method=PlaneRCNN.features)))(p))

    stage("features fwd+bwd", feat_grad, (params, imgs_f))

    # depth decoder isolated at train shapes (stage 3's widest non-ROI
    # module: 5 conv lanes + 5 deconv merges at up to 120x160, bilinear to
    # 480x640) — from precomputed FPN features so only the decoder is timed
    if cfg.model.depth_on:
        feats0 = jax.jit(lambda p, im: model.apply(
            {"params": p, "batch_stats": batch_stats}, im,
            method=PlaneRCNN.features))(params, imgs_f)
        jax.block_until_ready(feats0)

        def depth_fwd(p, fs):
            return model.apply({"params": p, "batch_stats": batch_stats}, fs,
                               train=False,
                               method=lambda m, f, train: m.depth_head(
                                   f, train=train)).sum()

        stage("depth head fwd", depth_fwd, (params, feats0))

        def depth_grad(p, fs):
            return _reduce(jax.grad(lambda pp: depth_fwd(pp, fs))(p))

        stage("depth head fwd+bwd", depth_grad, (params, feats0))

    def loss_fwd(p, b, k):
        losses, _ = compute_losses(model, p, batch_stats, b, k, cfg)
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    stage("loss fwd (full train forward)", loss_fwd, (params, batch, key))

    def loss_grad(p, b, k):
        return _reduce(jax.grad(lambda pp: loss_fwd(pp, b, k))(p))

    stage("loss fwd+bwd (value_and_grad)", loss_grad, (params, batch, key))

    tx = build_optimizer(cfg, params)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    step_fn = make_train_step(cfg, model, tx)

    def full_step(s, b, k):
        # the timed value must DEPEND on the updated state: reading only
        # total_loss lets XLA dead-code-eliminate the whole backward +
        # optimizer (measured: the DCE'd program runs at forward-only time)
        ns, metrics = step_fn(s, b, k)
        return metrics["total_loss"] + _reduce(ns.params)

    stage("full step (grad+optimizer)", full_step, (state, batch, key))

    # -- the training pooler in isolation at train shapes -------------------
    from articulation3d_tpu.models.planercnn import ROI_STRIDES
    from articulation3d_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_train)

    feats = jax.jit(lambda p, im: model.apply(
        {"params": p, "batch_stats": batch_stats}, im,
        method=PlaneRCNN.features))(params, imgs_f)
    roi_feats = [feats[f] for f in cfg.model.roi_heads.in_features]
    jax.block_until_ready(roi_feats)
    n = cfg.model.roi_heads.batch_size_per_image
    rs = np.random.RandomState(0)
    x1 = rs.uniform(0, w * 0.7, (args.ims, n)).astype(np.float32)
    y1 = rs.uniform(0, h * 0.7, (args.ims, n)).astype(np.float32)
    bxs = jax.device_put(jnp.asarray(np.stack(
        [x1, y1, x1 + rs.uniform(8, w * 0.3, (args.ims, n)),
         y1 + rs.uniform(8, h * 0.3, (args.ims, n))], -1), jnp.float32), dev)
    res = cfg.model.box_head.pooler_resolution
    sr = cfg.model.box_head.pooler_sampling_ratio

    for label, use_pallas in (("pallas", True), ("xla", False)):
        pool = lambda fs, bx, up=use_pallas: multilevel_roi_align_train(
            fs, bx, strides=ROI_STRIDES, output_size=res, sampling_ratio=sr,
            aligned=True, chunk=32, use_pallas=up)
        stage(f"train pool fwd ({label}, {n} rois/im)",
              lambda fs, bx, p=pool: p(tuple(fs), bx).sum(),
              (tuple(roi_feats), bxs))
        stage(f"train pool fwd+bwd ({label})",
              lambda fs, bx, p=pool: _reduce(jax.grad(
                  lambda f2: p(f2, bx).sum())(tuple(fs))),
              (tuple(roi_feats), bxs))


if __name__ == "__main__":
    main()
