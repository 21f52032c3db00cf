"""Stage-level inference profile on the real chip -> markdown table.

Times the flagship inference program and its prefixes (backbone+FPN, +RPN,
+box head, full cascade; XLA vs Pallas ROI pooler) at a given batch size,
with warm buffers (one execute+readback before timing — the axon device_put
is lazy).  Writes/refreshes `PROFILE.md` at the repo root.

Usage:  python tools/profile_inference.py [--batch 32] [--steps 5]
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
    # HOST READBACK, not block_until_ready: on the axon remote platform the
    # latter returns before the device work completes; pulling the scalar
    # value is the only reliable sync (same reason bench.py reads scores)
    float(np.asarray(fn(*args)))      # compile + first transfer
    float(np.asarray(fn(*args)))      # warm
    t0 = time.time()
    for _ in range(steps):
        float(np.asarray(fn(*args)))
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--output", default=None, help="markdown path")
    ap.add_argument("--preset", choices=("parity", "serving"),
                    default="parity",
                    help="capacity preset; serving = serving_config caps "
                         "(PROFILE table rows are labeled with the preset)")
    args = ap.parse_args()

    from articulation3d_tpu.config import inference_config, serving_config
    from articulation3d_tpu.models import PlaneRCNN, init_params
    from articulation3d_tpu.utils.debug_weights import bias_for_detections

    cfg = serving_config() if args.preset == "serving" else inference_config()
    h, w = cfg.input.height, cfg.input.width
    b = args.batch

    init_cfg = cfg.replace(
        input=dataclasses.replace(cfg.input, height=128, width=160),
        model=dataclasses.replace(
            cfg.model, dtype="float32", roi_pooler_impl="xla",
            rpn=dataclasses.replace(cfg.model.rpn, pre_nms_topk_test=64,
                                    post_nms_topk_test=64),
            roi_heads=dataclasses.replace(cfg.model.roi_heads,
                                          detections_per_image=8),
            depth_head=dataclasses.replace(cfg.model.depth_head,
                                           output_height=128,
                                           output_width=160)))
    t0 = time.time()
    with jax.default_device(jax.devices("cpu")[0]):
        _, variables = init_params(init_cfg, jax.random.PRNGKey(0))
        # biased logits: a realistic survivor population through NMS/paste
        # (raw He-init keeps zero detections, letting the validity
        # predication zero out the cascade's cost — bench.py rationale)
        variables = dict(variables,
                         params=bias_for_detections(variables["params"]))
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    print(f"# init {time.time() - t0:.0f}s", file=sys.stderr)

    rs = np.random.RandomState(0)
    images = jax.device_put(
        jnp.asarray(rs.randn(b, h, w, 3), jnp.float32), jax.devices()[0])
    jax.block_until_ready(images)

    rows = []

    def reduced(fn):
        # scalar-sum outputs: keeps all compute live (no DCE) but avoids
        # materializing/transferring giant output buffers
        def wrapped(v, im):
            out = fn(v, im)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), out, 0.0)
        return wrapped

    def stage(name, fn):
        try:
            dt = _time_fn(jax.jit(reduced(fn)), (variables, images),
                          args.steps)
        except Exception as e:
            # record WHY instead of a bare nan row (the XLA gather pooler
            # OOMs HBM at batch >= 32: its scattered-row gathers
            # materialize per-sample intermediates — PROFILE.md notes)
            print(f"{name:<28} FAILED: {type(e).__name__}", flush=True)
            rows.append((name, f"{type(e).__name__} (see notes)", ""))
            return
        rows.append((name, f"{dt*1000:.1f}", f"{b/dt:.1f}"))
        print(f"{name:<28} {dt*1000:8.1f} ms/step  {b/dt:7.1f} f/s",
              flush=True)

    model = PlaneRCNN(cfg)
    stage("backbone+fpn", lambda v, im: model.apply(
        v, im, method=PlaneRCNN.features))

    def to_rpn(mdl, im):
        feats = mdl.features(im)
        props, _ = mdl.rpn(feats, image_height=h, image_width=w,
                           training=False)
        return props

    stage("+rpn (proposals)", lambda v, im: model.apply(
        v, im, method=to_rpn))

    detonly = PlaneRCNN(cfg.replace(model=dataclasses.replace(
        cfg.model, mask_on=False, plane_on=False, axis_on=False,
        depth_on=False)))
    stage("+box stage (pool+head+NMS)", lambda v, im: detonly.apply(
        v, im, method=PlaneRCNN.inference))
    stage("full inference (pallas)", lambda v, im: model.apply(
        v, im, method=PlaneRCNN.inference))

    xla_model = PlaneRCNN(cfg.replace(model=dataclasses.replace(
        cfg.model, roi_pooler_impl="xla")))
    stage("full inference (xla pool)", lambda v, im: xla_model.apply(
        v, im, method=PlaneRCNN.inference))

    # extra (unused) param-collection entries are ignored by flax apply
    nodepth = PlaneRCNN(cfg.replace(model=dataclasses.replace(
        cfg.model, depth_on=False)))
    stage("inference w/o depth head", lambda v, im: nodepth.apply(
        v, im, method=PlaneRCNN.inference))

    out = args.output or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE.md")
    backend = jax.default_backend()
    table = [f"## Latest measured stage table (batch={b}, {backend}, "
             f"{args.preset} preset, biased weights)", "",
             "| stage | ms/step | frames/s |", "|---|---|---|"]
    table += [f"| {name} | {ms} | {fps} |" for name, ms, fps in rows]
    block = "\n".join(table) + "\n"
    begin, end = "<!-- profile:begin -->", "<!-- profile:end -->"
    # update only the marked section so the hand-curated analysis/history in
    # PROFILE.md survives re-runs
    try:
        text = open(out).read()
    except FileNotFoundError:
        text = f"# Inference profile\n\n{begin}\n{end}\n"
    if begin in text and end in text:
        head, rest = text.split(begin, 1)
        _, tail = rest.split(end, 1)
        text = head + begin + "\n" + block + end + tail
    else:
        text += f"\n{begin}\n{block}{end}\n"
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
