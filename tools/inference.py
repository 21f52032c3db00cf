"""Video -> articulation detections -> temporal optimization -> artifacts.

CLI mirror of the reference `tools/inference.py:170-288`:

    python tools/inference.py --config configs/config.yaml \
        --input video.mp4 --output out/ [--save-obj] [--webvis] \
        [--conf-threshold 0.7]

but the per-frame batch-1 GPU loop becomes one batched jitted program per
chunk of frames (frames are the batch axis on TPU).
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_model(config):
    import jax
    from articulation3d_tpu.models import PlaneRCNN, init_params
    from articulation3d_tpu.train.checkpoint import (latest_checkpoint,
                                                     load_torch_state_dict,
                                                     port_detectron2_state_dict)

    model, variables = init_params(config, jax.random.PRNGKey(config.seed))
    w = config.weights
    if w and (w.endswith(".pth") or w.endswith(".pkl")):
        params, batch_stats, stats = port_detectron2_state_dict(
            load_torch_state_dict(w), variables["params"],
            variables.get("batch_stats"))
        print(f"ported weights from {w}: {stats}")
        variables = {"params": params, "batch_stats": batch_stats}
    elif w:
        from articulation3d_tpu.train.train_step import create_train_state
        from articulation3d_tpu.train.checkpoint import load_checkpoint
        _, state = create_train_state(config, jax.random.PRNGKey(0))
        path = latest_checkpoint(w) or w
        state = load_checkpoint(path, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"restored checkpoint {path}")
    return model, variables


def main():
    random.seed(2020)
    np.random.seed(2020)

    parser = argparse.ArgumentParser(
        description="Generate articulation predictions for a video.")
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True, help="input video/png")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--save-obj", action="store_true")
    parser.add_argument("--webvis", action="store_true")
    parser.add_argument("--conf-threshold", default=0.7, type=float)
    parser.add_argument("--batch-size", default=8, type=int)
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)

    from articulation3d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    from articulation3d_tpu.config import load_config
    from articulation3d_tpu.data.catalog import get_metadata
    from articulation3d_tpu.temporal import optimize_planes, track_planes
    from articulation3d_tpu.video import (VideoPipeline, read_frames,
                                          write_video)
    from articulation3d_tpu.vis import (ArtiVisualizer, draw_pred,
                                        get_normal_map)

    config = load_config(args.config)
    model, variables = load_model(config)
    pipeline = VideoPipeline(config, model, variables,
                             batch_size=args.batch_size,
                             conf_threshold=args.conf_threshold)

    metadata = get_metadata("arti_train")
    shortened = {"arti_rot": "R", "arti_tran": "T"}
    cls_name_map = [shortened[c] for c in metadata.thing_classes]

    t0 = time.time()
    frames, fps = read_frames(args.input, config.input.height,
                              config.input.width)
    is_video = fps is not None
    t1 = time.time()
    print(f"decoded {len(frames)} frames ({t1 - t0:.1f}s)")

    preds = pipeline.run(frames, verbose=True)
    t2 = time.time()
    print(f"inference: {t2 - t1:.1f}s "
          f"({len(frames) / (t2 - t1):.1f} frames/s incl. compile+readback)")

    # pre-optimization visualization
    org_vis_list = []
    for im, p in zip(frames, preds):
        vis = ArtiVisualizer(im[:, :, ::-1])  # BGR -> RGB
        seg = draw_pred(vis, p, metadata, cls_name_map,
                        conf_threshold=args.conf_threshold)
        if len(p) == 0:
            normal_vis = get_normal_map(np.array([[1.0, 0, 0]]),
                                        np.zeros((1, *im.shape[:2])))
        else:
            normal_vis = get_normal_map(p.planes, p.masks)
        org_vis_list.append(np.concatenate((seg, normal_vis), axis=1))

    # temporal optimization
    t3 = time.time()
    planes = track_planes(preds)
    opt_preds = optimize_planes(preds, planes, "3dc", frames=frames,
                                h=config.input.height, w=config.input.width)
    print(f"track+optimize: {time.time() - t3:.1f}s ({len(planes)} tracks)")

    out_frames = []
    for im, p, org in zip(frames, opt_preds, org_vis_list):
        vis = ArtiVisualizer(im[:, :, ::-1])
        seg = draw_pred(vis, p, metadata, cls_name_map)
        if len(p) == 0:
            normal_vis = get_normal_map(np.array([[1.0, 0, 0]]),
                                        np.zeros((1, *im.shape[:2])))
        else:
            normal_vis = get_normal_map(p.planes, p.masks)
        out_frames.append(np.concatenate((seg, normal_vis, org), axis=1))

    t4 = time.time()
    if is_video:
        write_video(os.path.join(args.output, "output.mp4"), out_frames,
                    fps=fps, bgr=False)
    else:
        import cv2
        cv2.imwrite(os.path.join(args.output, "output.png"),
                    out_frames[0][:, :, ::-1])
    print(f"wrote visualization to {args.output} ({time.time() - t4:.1f}s)")

    if args.save_obj:
        t5 = time.time()
        from articulation3d_tpu.export import save_obj_model
        for frame_id in [0, 30, 60, 89]:
            if frame_id < len(frames):
                save_obj_model(opt_preds, frames, frame_id, args.output,
                               webvis=args.webvis)
        print(f"wrote .obj models ({time.time() - t5:.1f}s)")


if __name__ == "__main__":
    main()
