"""Compare reference golden tensors against the jax model, stage by stage.

The consumer half of the parity harness: given a goldens .npz (from
`tools/make_goldens.py`, run in the reference detectron2 environment) and a
reference checkpoint (.pth/.pkl), port the weights, run `inference_probe`,
and print per-stage max-err / matching statistics.

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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--goldens", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--pooler", default="xla", choices=["xla", "pallas", "auto"])
    ap.add_argument("--score-thresh", type=float, default=0.05)
    args = ap.parse_args()

    from articulation3d_tpu.config import inference_config
    from articulation3d_tpu.evaluation.goldens import (compare_goldens,
                                                       load_goldens)
    from articulation3d_tpu.models.planercnn import init_params
    from articulation3d_tpu.train.checkpoint import (load_torch_state_dict,
                                                     port_detectron2_state_dict)

    cfg = inference_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, dtype="float32", roi_pooler_impl=args.pooler))

    _, variables = init_params(cfg, jax.random.PRNGKey(0))
    state_dict = load_torch_state_dict(args.weights)
    params, batch_stats, stats = port_detectron2_state_dict(
        state_dict, variables["params"], variables.get("batch_stats", {}))
    print(f"port: {stats}")
    variables = {"params": params, "batch_stats": batch_stats}

    goldens = load_goldens(args.goldens)
    report = compare_goldens(goldens, cfg, variables,
                             score_thresh=args.score_thresh)
    width = max(len(k) for k in report)
    for k in sorted(report):
        print(f"{k:<{width}}  {report[k]:.6g}")


if __name__ == "__main__":
    main()
