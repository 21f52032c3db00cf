"""Produce a COMMITTED goldens fixture from the pure-torch oracle.

`tools/make_goldens.py` is the real producer — it needs the reference
detectron2 environment plus the released `model_final.pth`, neither of which
exists in this image.  This tool is its stand-in: it runs the d2-free torch
oracle (`tests/torch_oracle.py`) with the DETERMINISTIC synthetic He-init
state dict (`he_state_dict(seed)`) on a small seeded frame and writes a
fixture in the exact same .npz schema (`articulation3d_tpu/evaluation/
goldens.py`), so the producer->consumer path of the parity harness is
exercised end to end in CI without the real weights.

The fixture carries `meta_*` keys (input size, topk, detections, score
threshold) so `tools/compare_goldens.py` reconstructs the matching model
config; fixtures from the real reference (no meta keys) default to the full
480x640 inference config.

Regenerate (e.g. after an oracle/schema change):
  python tools/make_goldens_oracle.py --output tests/fixtures/golden_oracle_64x96.npz

The moment the released `model_final.pth` is obtainable, the REAL parity run
is (reference env first, then here):
  python tools/make_goldens.py --config config/config.yaml \
      --weights model_final.pth --input frame.png --output golden.npz
  python tools/compare_goldens.py --goldens golden.npz --weights model_final.pth
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

H, W = 64, 96
TOPK = 64
DETS = 8
SCORE_THRESH = 0.05


def build_oracle_goldens(seed: int = 0, image_seed: int = 7,
                         h: int = H, w: int = W, topk: int = TOPK,
                         dets: int = DETS, bias: bool = False,
                         features: bool = True) -> dict:
    """{goldens-schema key: array} from one oracle forward (see module doc).

    `bias=True` lifts the RPN-objectness / foreground-class biases
    (`torch_oracle.bias_state_dict_for_detections`) so a realistic survivor
    population flows through NMS/paste — the second committed fixture
    (VERDICT r3 #7) exercises golden matching on a NON-empty detection set
    at 128x160.
    """
    import torch
    from torch_oracle import (PlaneRCNNOracle, bias_state_dict_for_detections,
                              he_state_dict, preprocess)

    state_dict = he_state_dict(seed)
    if bias:
        state_dict = bias_state_dict_for_detections(state_dict)
    oracle = PlaneRCNNOracle(pre_nms_topk=topk, post_nms_topk=topk,
                             score_thresh=SCORE_THRESH,
                             detections_per_image=dets, depth_hw=(h, w))
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state_dict.items()}, strict=False)
    assert not missing, missing
    assert all("anchor_generator" in k for k in unexpected), unexpected

    rs = np.random.RandomState(image_seed)
    image = rs.randint(0, 255, (h, w, 3)).astype(np.uint8)
    with torch.no_grad():
        t_out = oracle(preprocess(image))

    goldens = {"image": image}
    if features:
        for k, v in t_out["features"].items():
            goldens[k] = v[0].astype(np.float32)             # (C, Hl, Wl)
    goldens["proposal_boxes"] = t_out["proposal_boxes"].astype(np.float32)
    goldens["proposal_logits"] = t_out["proposal_scores"].astype(np.float32)
    goldens["det_boxes"] = t_out["boxes"].astype(np.float32)
    goldens["det_scores"] = t_out["scores"].astype(np.float32)
    goldens["det_classes"] = t_out["classes"].astype(np.int64)
    goldens["pred_masks"] = t_out["masks"].astype(np.float32)
    goldens["pred_planes"] = t_out["planes"].astype(np.float32)
    goldens["pred_rot_axis"] = t_out["rot_axis"].astype(np.float32)
    goldens["pred_tran_axis"] = t_out["tran_axis"].astype(np.float32)
    goldens["depth"] = t_out["depth"].astype(np.float32)
    # config the consumer must rebuild to reproduce this run
    goldens["meta_topk"] = np.asarray(topk, np.int32)
    goldens["meta_dets"] = np.asarray(dets, np.int32)
    goldens["meta_score_thresh"] = np.asarray(SCORE_THRESH, np.float32)
    goldens["meta_weights_seed"] = np.asarray(seed, np.int32)
    goldens["meta_bias"] = np.asarray(1 if bias else 0, np.int32)
    return goldens


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", default=os.path.join(
        _ROOT, "tests", "fixtures", "golden_oracle_64x96.npz"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--topk", type=int, default=TOPK)
    ap.add_argument("--dets", type=int, default=DETS)
    ap.add_argument("--bias", action="store_true",
                    help="bias objectness/class logits for a non-empty "
                         "survivor population (second fixture)")
    ap.add_argument("--no-features", action="store_true",
                    help="omit the p2..p6 feature maps (compare_goldens "
                         "skips absent keys): keeps the 480x640 "
                         "production-capacity fixture committable (~2MB "
                         "instead of ~27MB); feature parity stays pinned "
                         "by the two small fixtures")
    args = ap.parse_args()

    from articulation3d_tpu.evaluation.goldens import save_goldens

    goldens = build_oracle_goldens(args.seed, h=args.height, w=args.width,
                                   topk=args.topk, dets=args.dets,
                                   bias=args.bias,
                                   features=not args.no_features)
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    save_goldens(args.output, goldens)
    n_det = int((goldens["det_scores"] > SCORE_THRESH).sum())
    print(f"wrote {args.output} "
          f"({os.path.getsize(args.output) / 1e6:.2f} MB, {n_det} detections)")
    assert n_det >= 1, "degenerate fixture: no detections survive"


if __name__ == "__main__":
    main()
