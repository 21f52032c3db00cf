"""Time REAL training steps on the TPU chip and log a loss curve.

VERDICT r2 next #2: training had only ever executed on CPU (tests + the
multichip dryrun).  This drives the production single-device train step
(`make_train_step` — forward, all enabled losses, backward, SGD update) at
the full 480x640 input on the real chip:

  * stage 1 (`step1_bbox_config`): detector-only recipe, ims/batch and ROI
    sampling as shipped (`config/step1_bbox.yaml:36-43` in the reference);
  * stage 3 (`step3_plane_config`-like, all heads on) for the full-cascade
    memory check of the differentiable XLA pooling path.

A fixed synthetic batch is reused every step, so the loss curve must
DECREASE if the optimizer plumbing is real (overfit-one-batch).  Results:
steps/s + HBM stats on stdout, d2-style metrics lines appended to
`<out>/metrics.json`, summary row recorded in PROFILE.md (by hand).

Usage (TPU):
  python tools/train_on_chip.py --stage 1 --ims 16 --steps 50
"""

from __future__ import annotations

import argparse
import dataclasses
import json
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


def _config(stage: int, ims: int, height: int, width: int,
            remat: bool = False):
    from articulation3d_tpu.config import (step1_bbox_config,
                                           step3_plane_config)
    cfg = step1_bbox_config() if stage == 1 else step3_plane_config()
    solver = dataclasses.replace(cfg.solver, ims_per_batch=ims,
                                 base_lr=0.002)
    model = cfg.model
    if remat:
        model = dataclasses.replace(
            model, resnet=dataclasses.replace(model.resnet, remat=True))
    if (height, width) != (cfg.input.height, cfg.input.width):
        # CPU smoke runs shrink the input; depth gt follows the input size
        model = dataclasses.replace(
            model, depth_head=dataclasses.replace(
                model.depth_head, output_height=height, output_width=width))
    return cfg.replace(solver=solver, model=model,
                       input=dataclasses.replace(cfg.input, height=height,
                                                 width=width))


def _batch(cfg, b: int, g: int = 4):
    """Deterministic synthetic batch with g GT instances per image."""
    h, w = cfg.input.height, cfg.input.width
    rs = np.random.RandomState(0)
    bs = max(20, min(h, w) // 5)           # GT box scale follows the input
    boxes = []
    for _ in range(b * g):
        x1 = rs.uniform(0, w - 2 * bs)
        y1 = rs.uniform(0, h - 2 * bs)
        boxes.append([x1, y1, x1 + rs.uniform(bs, 2 * bs),
                      y1 + rs.uniform(bs, 2 * bs)])
    boxes = np.asarray(boxes, np.float32).reshape(b, g, 4)
    masks = np.zeros((b, g, h, w), np.float32)
    for i in range(b):
        for j in range(g):
            x1, y1, x2, y2 = boxes[i, j].astype(int)
            masks[i, j, y1:y2, x1:x2] = 1.0
    dh, dw = cfg.model.depth_head.output_height, cfg.model.depth_head.output_width
    axis = np.tile(np.asarray([0.6, 0.8, 0.1, 1.0], np.float32), (b, g, 1))
    return {
        # RAW pixel domain: the train step normalizes on device
        # (train_step.compute_losses), consuming uint8 mapper output
        "images": rs.randint(0, 256, (b, h, w, 3)).astype(np.uint8),
        "gt_boxes": boxes,
        "gt_classes": rs.randint(0, 2, (b, g)).astype(np.int32),
        "gt_valid": np.ones((b, g), bool),
        "gt_masks": masks,
        "gt_planes": np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (b, g, 1)),
        "gt_rot_axis": axis,
        "gt_tran_axis": axis.copy(),
        "gt_depth": np.abs(rs.randn(b, dh, dw)).astype(np.float32) + 1.0,
    }


def _mem(dev) -> str:
    try:
        s = dev.memory_stats()
        return (f"in_use {s.get('bytes_in_use', 0) / 2**30:.2f} GiB, "
                f"peak {s.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB, "
                f"limit {s.get('bytes_limit', 0) / 2**30:.2f} GiB")
    except Exception as e:  # memory_stats is optional on some PJRT backends
        return f"memory_stats unavailable ({e})"


def main():  # noqa: C901
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", type=int, default=1, choices=(1, 3))
    ap.add_argument("--ims", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize backbone blocks (fits ims 16)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--ksteps", type=int, default=1,
                    help="steps fused per dispatch (lax.scan over the "
                         "donated state); amortizes the ~1.4 s/step "
                         "per-output-handle tunnel tax k-fold (PROFILE.md)")
    ap.add_argument("--out", default="exps/train_on_chip")
    args = ap.parse_args()

    from articulation3d_tpu.models import init_params, PlaneRCNN
    from articulation3d_tpu.train.optimizer import build_optimizer
    from articulation3d_tpu.train.train_step import (TrainState,
                                                     make_repeat_step,
                                                     make_train_step)

    cfg = _config(args.stage, args.ims, args.height, args.width,
                  remat=args.remat)
    dev = jax.devices()[0]
    print(f"# backend {jax.default_backend()}, device {dev}", flush=True)

    # init on host CPU at a small input (param shapes are input-independent),
    # then place on the chip; momentum is created ON device by tx.init
    t0 = time.time()
    init_cfg = cfg.replace(
        input=dataclasses.replace(cfg.input, height=128, width=160),
        model=dataclasses.replace(
            cfg.model, roi_pooler_impl="xla",
            depth_head=dataclasses.replace(cfg.model.depth_head,
                                           output_height=128,
                                           output_width=160)))
    with jax.default_device(jax.devices("cpu")[0]):
        model_cpu, variables = init_params(init_cfg, jax.random.PRNGKey(0))
    params = jax.device_put(variables["params"], dev)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), dev)
    jax.block_until_ready(params)
    print(f"# init + weights to chip {time.time() - t0:.1f}s", flush=True)

    tx = build_optimizer(cfg, params)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    model = PlaneRCNN(cfg)
    raw_step = make_train_step(cfg, model, tx)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))
    # k-step fused dispatch on the ONE fixed batch: xs=None scan, so the
    # 480x640 batch is not stacked k times in HBM
    repeat_fn = (jax.jit(make_repeat_step(raw_step, args.ksteps),
                         donate_argnums=(0,))
                 if args.ksteps > 1 else None)

    batch = jax.device_put(_batch(cfg, args.ims), dev)
    key = jax.device_put(jax.random.PRNGKey(42), dev)
    jax.block_until_ready(batch)
    print(f"# state + batch resident: {_mem(dev)}", flush=True)

    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["total_loss"])
    print(f"# compile + first step {time.time() - t0:.1f}s", flush=True)
    print(f"# after step 1: {_mem(dev)}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    mpath = os.path.join(args.out, "metrics.json")

    mkeys = None

    def metrics_line(i, m):
        # ONE device op + ONE tunnel transfer for the whole dict (a
        # per-leaf float() costs a ~1s round trip EACH over the dev
        # tunnel: 10 leaves ~ 13s/step)
        nonlocal mkeys
        if mkeys is None:
            mkeys = sorted(m)
        host = np.asarray(jnp.stack([m[k] for k in mkeys]))
        return json.dumps({"iteration": i, "stage": args.stage,
                           **{k: float(v) for k, v in zip(mkeys, host)}}) + "\n"

    losses = [float(np.asarray(metrics["total_loss"]))]
    # Timed loop: DISPATCH every step, sync once at the end.  The steps are
    # chained through `state` (donated), so they execute sequentially on
    # device regardless; a per-step loss fetch would add one dev-tunnel
    # round trip per step to the measurement (~0.8-1.8s/step depending on
    # tunnel congestion — it buried a 2.8x device-step win as noise).  The
    # per-step loss curve is still recorded: the metric handles are
    # collected during the loop and fetched after the clock stops.
    first_metrics = metrics                     # step 1 (the compile step)
    pending = []        # (step_index, metrics, stacked_k or 0)
    if repeat_fn is not None:
        # warm the k-step program OUTSIDE the clock (its first call compiles)
        state, warm_metrics = repeat_fn(state, batch, key)
        assert int(np.asarray(state.step)) == 1 + args.ksteps
        warm = 1 + args.ksteps
        pending.append((warm, warm_metrics, args.ksteps))
    else:
        warm = 1
    i = warm
    t0 = time.time()
    while i < args.steps:
        if repeat_fn is not None and i + args.ksteps <= args.steps:
            state, metrics = repeat_fn(state, batch, key)
            pending.append((i + args.ksteps, metrics, args.ksteps))
            i += args.ksteps
        else:
            state, metrics = step_fn(state, batch, key)
            pending.append((i + 1, metrics, 0))
            i += 1
    # value fetch, not block_until_ready: the axon platform's
    # block_until_ready returns before device work completes (PROFILE.md);
    # reading the final step counter forces the whole donated-state chain
    assert int(np.asarray(state.step)) == args.steps
    dt = time.time() - t0
    timed = args.steps - warm
    sps = timed / dt if timed else float("nan")

    with open(mpath, "a") as mf:
        mf.write(metrics_line(1, first_metrics))
        for last, m, kk in pending:
            if kk:  # stacked (k,) metric leaves from the fused dispatch
                host = {k2: np.asarray(v) for k2, v in m.items()}
                for j in range(kk):
                    step_i = last - kk + 1 + j
                    total = float(host["total_loss"][j])
                    losses.append(total)
                    mf.write(json.dumps({
                        "iteration": step_i, "stage": args.stage,
                        **{k2: float(v[j]) for k2, v in host.items()},
                    }) + "\n")
                    if step_i % 5 == 0 or step_i == args.steps:
                        print(f"# step {step_i}: total_loss {total:.4f}",
                              flush=True)
                continue
            total = float(np.asarray(m["total_loss"]))
            losses.append(total)
            if last % 5 == 0 or last == args.steps:
                mf.write(metrics_line(last, m))
                print(f"# step {last}: total_loss {total:.4f}", flush=True)
            else:
                mf.write(json.dumps({"iteration": last, "stage": args.stage,
                                     "total_loss": total}) + "\n")
    print(f"# {_mem(dev)}", flush=True)

    first5 = float(np.mean(losses[:5]))
    last5 = float(np.mean(losses[-5:]))
    ok = last5 < first5 and np.isfinite(losses).all()
    print(json.dumps({
        "metric": f"train_steps_per_s_stage{args.stage}_ims{args.ims}"
                  + (f"_k{args.ksteps}" if args.ksteps > 1 else "")
                  + ("_remat" if args.remat else ""),
        "value": round(sps, 4), "unit": "steps/s",
        "images_per_s": round(sps * args.ims, 2),
        "loss_first5": round(first5, 4), "loss_last5": round(last5, 4),
        "loss_decreasing": bool(ok),
    }), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
