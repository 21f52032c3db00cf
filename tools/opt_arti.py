"""Benchmark evaluation with temporal optimization (reference
`tools/opt_arti.py:33-355`, rebuilt with correct imports — the original
carries stale `planercnn.*` imports, SURVEY.md §7.4).

    python tools/opt_arti.py --config configs/config.yaml \
        --input instances_predictions.pth --output out/ \
        [--dataset arti_test] [--video-root DIR] [--load-results] \
        [--vis-dir DIR] [--vis-num 50]

Flow: group saved test-set predictions by video id parsed from
`{youtube11}_{shot}_{frame}_{offset}` file names, re-run batched inference
over each clip, temporally optimize, rebuild prediction dicts for annotated
keyframes, and run the ArtiEvaluator directly.  SLURM-array sharding and the
`--load-results` merge mode are preserved.
"""

import argparse
import math
import os
import random
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_frame_name(file_path):
    """'{youtube11}_{shot}_{frame}_{offset}.png' -> (video_id, offset)."""
    filename = file_path.split("/")[-1]
    prefix = filename.replace(".png", "")
    youtube_id = prefix[:11]
    splits = prefix.split("_")
    shot_id = int(splits[-3])
    frame_id = int(splits[-2])
    frame_offset = int(splits[-1])
    return f"{youtube_id}_{shot_id}_{frame_id}", frame_offset


def main():
    random.seed(2020)
    np.random.seed(2020)

    parser = argparse.ArgumentParser(
        description="Temporal optimization + benchmark evaluation.")
    parser.add_argument("--config", required=True)
    parser.add_argument("--load-results", action="store_true")
    parser.add_argument("--input", required=True,
                        help="instances_predictions.pth from a prior eval run")
    parser.add_argument("--output", required=True)
    parser.add_argument("--dataset", default="arti_test")
    parser.add_argument("--conf-threshold", default=0.7, type=float)
    parser.add_argument("--vis-dir", default=None, type=str)
    parser.add_argument("--vis-num", default=50, type=int)
    parser.add_argument("--video-root", default=None, type=str,
                        help="directory holding {video_id}.mp4 clips")
    parser.add_argument("--batch-size", default=8, type=int)
    args = parser.parse_args()

    from articulation3d_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    import torch

    from articulation3d_tpu.config import load_config
    from articulation3d_tpu.data.catalog import get_dataset_dicts, get_metadata
    from articulation3d_tpu.evaluation import ArtiEvaluator
    from articulation3d_tpu.temporal import (check_axis, optimize_planes,
                                             track_planes)
    from articulation3d_tpu.video import VideoPipeline, read_frames

    os.makedirs(args.output, exist_ok=True)
    cfg = load_config(args.config)
    metadata = get_metadata(args.dataset)

    if args.load_results:
        predictions, corrs, corrs_opt = [], [], []
        for pred_fpath in glob(os.path.join(args.output, "predictions_*.pth")):
            print("reading " + pred_fpath)
            data = torch.load(pred_fpath, weights_only=False)
            predictions.extend(data["predictions"])
            corrs.extend(data["corrs"])
            corrs_opt.extend(data["corrs_opt"])
        for name, arr in (("corr", corrs), ("corr_opt", corrs_opt)):
            a = np.abs(np.asarray(arr, np.float64))
            a = a[~np.isnan(a)]
            print(name, a.mean() if len(a) else float("nan"))
        evaluator = ArtiEvaluator(args.dataset, cfg, False,
                                  output_dir=args.output)
        evaluator.reset()
        print(f"[number of predictions]: {len(predictions)}")
        evaluator._predictions = predictions
        print(evaluator.evaluate())
        return

    predictions_in = torch.load(args.input, weights_only=False)

    video_ids = []
    pred_by_video = {}
    for p in predictions_in:
        video_id, frame_offset = parse_frame_name(p["file_name"])
        if video_id not in video_ids:
            video_ids.append(video_id)
        pred_by_video.setdefault(video_id, {})[frame_offset] = p

    gt_by_frame = {}
    for d in get_dataset_dicts(args.dataset):
        video_id, frame_offset = parse_frame_name(d["file_name"])
        gt_by_frame[f"{video_id}_{frame_offset}"] = d

    if args.vis_num >= 0:
        video_ids = random.sample(video_ids, min(args.vis_num, len(video_ids)))

    # slurm array sharding
    output_path = None
    if os.environ.get("SLURM_ARRAY_TASK_ID") is not None:
        array_task_id = int(os.environ["SLURM_ARRAY_TASK_ID"])
        array_task_cnt = int(os.environ["SLURM_ARRAY_TASK_MAX"]) + 1
        n = math.ceil(len(video_ids) / array_task_cnt)
        chunks = [video_ids[i:i + n] for i in range(0, len(video_ids), n)]
        video_ids = chunks[array_task_id] if array_task_id < len(chunks) else []
        output_path = os.path.join(
            args.output, "predictions_{:0>4}.pth".format(array_task_id))
        print(f"slurm detected: idx {array_task_id} total {array_task_cnt} "
              f"lines {len(video_ids)}")

    from tools.inference import load_model
    model, variables = load_model(cfg)
    pipeline = VideoPipeline(cfg, model, variables,
                             batch_size=args.batch_size,
                             conf_threshold=args.conf_threshold)

    video_root = args.video_root or "step2_filtered_clips"
    predictions, corrs, corrs_opt = [], [], []
    for video_id in video_ids:
        video_path = os.path.join(video_root, f"{video_id}.mp4")
        if not os.path.exists(video_path):
            print(f"missing clip {video_path}, skipping")
            continue
        frames, fps = read_frames(video_path, cfg.input.height,
                                  cfg.input.width)
        preds = pipeline.run(frames)

        planes = track_planes(preds)
        opt_preds = optimize_planes(preds, planes, "3dc", frames=frames,
                                    h=cfg.input.height, w=cfg.input.width)
        corr, corr_opt = check_axis(preds, opt_preds, planes["rot"], "debug",
                                    h=cfg.input.height, w=cfg.input.width)
        corrs.extend(corr)
        corrs_opt.extend(corr_opt)
        if planes["rot"]:
            from articulation3d_tpu.temporal import check_monotonic
            fit, fit_opt = check_monotonic(preds, opt_preds, planes["rot"],
                                           "debug")
            print(f"{video_id}: normal-plane fit "
                  f"{np.mean([f[0] for f in fit]):.4f} -> "
                  f"{np.mean([f[0] for f in fit_opt]):.4f}")

        for frame_offset, p in pred_by_video[video_id].items():
            if frame_offset >= len(opt_preds):
                continue
            pred = opt_preds[frame_offset]
            opt_p = {
                "image_id": p["image_id"],
                "file_name": p["file_name"],
                "pred_depth": p.get("pred_depth"),
                "instances": [],
                "pred_rot_axis": pred.rot_axis,
                "pred_tran_axis": pred.tran_axis,
                "pred_plane": pred.planes,
            }
            for i in range(len(pred)):
                b = pred.boxes[i]
                opt_p["instances"].append({
                    "image_id": p["image_id"],
                    "category_id": int(pred.classes[i]),
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0]), float(b[3] - b[1])],
                    "score": float(pred.scores[i]),
                })
            predictions.append(opt_p)

    if output_path is not None:
        torch.save({"predictions": predictions, "corrs": corrs,
                    "corrs_opt": corrs_opt}, output_path)
    else:
        evaluator = ArtiEvaluator(args.dataset, cfg, False,
                                  output_dir=args.output)
        evaluator.reset()
        evaluator._predictions = predictions
        print(evaluator.evaluate())


if __name__ == "__main__":
    main()
