"""Dump golden tensors from the REFERENCE torch/detectron2 model.

Run this in the reference environment (PyTorch + detectron2 + the released
`model_final.pth` — `README.md:24-49` of the reference repo); it is the
producer half of the parity harness.  The consumer (`tools/compare_goldens.py`)
runs here in the jax environment.

For each input image it saves one .npz with the fixture schema documented in
`articulation3d_tpu/evaluation/goldens.py`: raw image, FPN p2-p6, post-NMS
proposals, final detections + per-head outputs, depth.

Hook points in the reference (all torch forward hooks, no model edits):
  * backbone features: output of `model.backbone` (planercnn.py:150);
  * proposals: output of `model.proposal_generator` (planercnn.py:168);
  * detections/depth: `inference_single` return (planercnn.py:176-184).

Usage (reference env):
  python tools/make_goldens.py --config config/config.yaml \
      --weights exps/model_final.pth --input frame.png --output golden.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--input", required=True, help="png/jpg frame")
    ap.add_argument("--output", required=True, help="output .npz path")
    ap.add_argument("--score-thresh", type=float, default=0.05)
    args = ap.parse_args()

    try:
        import torch
        import cv2
        from detectron2.config import get_cfg
        from detectron2.engine import DefaultPredictor
    except ImportError as e:
        print(f"make_goldens.py must run in the reference detectron2 "
              f"environment: {e}", file=sys.stderr)
        sys.exit(2)

    # reference config assembly (tools/train_net.py:72-81)
    sys.path.insert(0, ".")
    from articulation3d.config import get_planercnn_cfg_defaults

    cfg = get_cfg()
    get_planercnn_cfg_defaults(cfg)
    cfg.merge_from_file(args.config)
    cfg.MODEL.WEIGHTS = args.weights
    cfg.MODEL.DEVICE = "cuda" if torch.cuda.is_available() else "cpu"
    predictor = DefaultPredictor(cfg)
    model = predictor.model
    model.eval()

    img = cv2.imread(args.input)               # BGR uint8
    img = cv2.resize(img, (640, 480))
    goldens = {"image": img}

    captured = {}
    hooks = [
        model.backbone.register_forward_hook(
            lambda m, i, o: captured.update(features=o)),
        model.proposal_generator.register_forward_hook(
            lambda m, i, o: captured.update(proposals=o[0])),
    ]
    with torch.no_grad():
        tensor = torch.as_tensor(img.astype("float32").transpose(2, 0, 1))
        outputs = model([{"image": tensor, "height": 480, "width": 640}])
    for h in hooks:
        h.remove()

    for k, v in captured["features"].items():
        goldens[k] = v[0].cpu().numpy()
    props = captured["proposals"][0]
    goldens["proposal_boxes"] = props.proposal_boxes.tensor.cpu().numpy()
    goldens["proposal_logits"] = props.objectness_logits.cpu().numpy()

    inst = outputs[0]["instances"].to("cpu")
    goldens["det_boxes"] = inst.pred_boxes.tensor.numpy()
    goldens["det_scores"] = inst.scores.numpy()
    goldens["det_classes"] = inst.pred_classes.numpy()
    if inst.has("pred_masks"):
        goldens["pred_masks"] = inst.pred_masks.numpy().astype(np.float32)
    if inst.has("pred_plane"):
        goldens["pred_planes"] = inst.pred_plane.numpy()
    if inst.has("pred_rot_axis"):
        goldens["pred_rot_axis"] = inst.pred_rot_axis.numpy()
    if inst.has("pred_tran_axis"):
        goldens["pred_tran_axis"] = inst.pred_tran_axis.numpy()
    if "depth" in outputs[0]:
        goldens["depth"] = outputs[0]["depth"].cpu().numpy()

    np.savez_compressed(args.output, **goldens)
    print(f"wrote {args.output}: {sorted(goldens)}")


if __name__ == "__main__":
    main()
