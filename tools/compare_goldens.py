"""Compare reference golden tensors against the jax model, stage by stage.

The consumer half of the parity harness: given a goldens .npz (from
`tools/make_goldens.py`, run in the reference detectron2 environment — or
from `tools/make_goldens_oracle.py`, the in-image synthetic stand-in) and a
reference checkpoint (.pth/.pkl), port the weights, run `inference_probe`,
and print per-stage max-err / matching statistics.

Fixtures carrying `meta_*` keys (oracle fixtures) rebuild the small config
they were produced with; real-reference fixtures default to the full
480x640 inference config.

Usage:
  python tools/compare_goldens.py --goldens golden.npz \
      --weights model_final.pth [--pooler xla|pallas]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _config_for(goldens, pooler: str):
    """Model config matching the fixture (meta keys) or the full default."""
    from articulation3d_tpu.config import (Config, DepthHeadConfig,
                                           InputConfig, ModelConfig,
                                           ROIHeadsConfig, RPNConfig,
                                           inference_config)
    if "meta_topk" not in goldens:
        cfg = inference_config()
        return cfg.replace(model=dataclasses.replace(
            cfg.model, dtype="float32", roi_pooler_impl=pooler))
    h, w = goldens["image"].shape[:2]
    topk = int(goldens["meta_topk"])
    dets = int(goldens["meta_dets"])
    model = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=topk, post_nms_topk_test=topk,
                      pre_nms_topk_train=topk, post_nms_topk_train=topk),
        roi_heads=ROIHeadsConfig(
            detections_per_image=dets, batch_size_per_image=dets,
            score_thresh_test=float(goldens["meta_score_thresh"])),
        depth_head=DepthHeadConfig(output_height=h, output_width=w),
        dtype="float32", roi_pooler_impl=pooler,
    )
    return Config(model=model, input=InputConfig(height=h, width=w))


def run_compare(goldens_path: str, weights_path: str, *, pooler: str = "xla",
                score_thresh: float = 0.05) -> dict:
    """Port `weights_path` into the jax model and compare against the
    fixture; returns the per-stage report dict (also used by the slow-tier
    fixture test)."""
    from articulation3d_tpu.evaluation.goldens import (compare_goldens,
                                                       load_goldens)
    from articulation3d_tpu.models.planercnn import init_params
    from articulation3d_tpu.train.checkpoint import (load_torch_state_dict,
                                                     port_detectron2_state_dict)

    goldens = load_goldens(goldens_path)
    cfg = _config_for(goldens, pooler)

    _, variables = init_params(cfg, jax.random.PRNGKey(0))
    state_dict = load_torch_state_dict(weights_path)
    params, batch_stats, stats = port_detectron2_state_dict(
        state_dict, variables["params"], variables.get("batch_stats", {}))
    print(f"port: {stats}")
    variables = {"params": params, "batch_stats": batch_stats}
    return compare_goldens(goldens, cfg, variables, score_thresh=score_thresh)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--goldens", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--pooler", default="xla", choices=["xla", "pallas", "auto"])
    ap.add_argument("--score-thresh", type=float, default=0.05)
    args = ap.parse_args()

    report = run_compare(args.goldens, args.weights, pooler=args.pooler,
                         score_thresh=args.score_thresh)
    width = max(len(k) for k in report)
    for k in sorted(report):
        print(f"{k:<{width}}  {report[k]:.6g}")


if __name__ == "__main__":
    main()
