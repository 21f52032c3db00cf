"""Micro-profile the depth decoder on the real chip (VERDICT r4 weak #6).

Times the 5-lane FPN depth decoder (`models/depth_head.py`, reference
`modeling/depth_net/depth_head.py:49-103`) in isolation at serving batch,
decomposed so the optimization target is measured, not guessed:

  * lanes only          — the five 256->128 ConvBNActs on p2..p6
  * decoder w/o resize  — lanes + deconv merges + 1-ch predictor (240x320)
  * full decoder        — + the final 2x bilinear resize to 480x640
  * full fwd (feats+depth) — backbone+FPN+decoder, the serving composition

Usage:  python tools/drive_depth.py [--batch 64]
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
    float(np.asarray(fn(*args)))      # compile
    float(np.asarray(fn(*args)))      # warm
    t0 = time.time()
    for _ in range(steps):
        float(np.asarray(fn(*args)))
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from articulation3d_tpu.config import serving_config
    from articulation3d_tpu.models import PlaneRCNN, init_params
    from articulation3d_tpu.models.depth_head import ConvBNAct, DepthHead

    cfg = serving_config()
    h, w = cfg.input.height, cfg.input.width
    b = args.batch
    dev = jax.devices()[0]

    init_cfg = cfg.replace(
        input=dataclasses.replace(cfg.input, height=128, width=160),
        model=dataclasses.replace(
            cfg.model, dtype="float32", roi_pooler_impl="xla",
            depth_head=dataclasses.replace(cfg.model.depth_head,
                                           output_height=128,
                                           output_width=160)))
    with jax.default_device(jax.devices("cpu")[0]):
        model_cpu, variables = init_params(init_cfg, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, dev)
    jax.block_until_ready(variables)

    model = PlaneRCNN(cfg)
    rs = np.random.RandomState(0)
    images = jax.device_put(jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
                            dev)

    # device-resident FPN features (the decoder's real input)
    feats = jax.jit(lambda v, im: model.apply(v, im,
                                              method=PlaneRCNN.features))(
        variables, images)
    jax.block_until_ready(feats)

    dvars = {"params": variables["params"]["depth_head"],
             "batch_stats": variables["batch_stats"]["depth_head"]}
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    head = DepthHead(cfg.model.depth_head, dtype=dtype)

    def reduced(fn):
        def wrapped(v, f):
            out = fn(v, f)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), out, 0.0)
        return wrapped

    def stage(name, fn, fargs):
        dt = _time_fn(jax.jit(reduced(fn)), fargs, args.steps)
        print(f"{name:<30} {dt*1000:8.1f} ms  {b/dt:7.1f} f/s", flush=True)

    def lanes_only(v, f):
        outs = []
        for i, name in enumerate(["p6", "p5", "p4", "p3", "p2"]):
            lane = ConvBNAct(128, "leaky_relu", dtype=dtype,
                             name=f"conv{i + 1}")
            outs.append(lane.apply(
                {"params": v["params"][f"conv{i + 1}"],
                 "batch_stats": v["batch_stats"][f"conv{i + 1}"]},
                f[name].astype(dtype)))
        return outs

    def full(v, f):
        return head.apply(v, f)

    def no_resize(v, f):
        # run the head with output dims = predictor grid (240x320): the
        # final resize becomes the identity-cost path
        ph, pw = f["p2"].shape[1] * 2, f["p2"].shape[2] * 2
        small = DepthHead(dataclasses.replace(cfg.model.depth_head,
                                              output_height=ph,
                                              output_width=pw), dtype=dtype)
        return small.apply(v, f)

    stage("lanes only (5x conv-bn)", lanes_only, (dvars, feats))
    stage("decoder w/o final resize", no_resize, (dvars, feats))
    stage("full decoder", full, (dvars, feats))

    def feats_plus_depth(v, im):
        f = model.apply(v, im, method=PlaneRCNN.features)
        return head.apply({"params": v["params"]["depth_head"],
                           "batch_stats": v["batch_stats"]["depth_head"]}, f)

    stage("backbone+fpn+decoder", feats_plus_depth, (variables, images))


if __name__ == "__main__":
    main()
