"""Whole-model golden-tensor parity harness.

Fixture format (one .npz per probe image, produced by `tools/make_goldens.py`
in the *reference* torch/detectron2 environment, consumed here in jax):

  image          (H, W, 3) uint8 BGR raw frame (pre-normalization)
  p2..p6         (C, Hl, Wl) float32 FPN features (torch NCHW layout)
  proposal_boxes (N, 4) float32 XYXY post-NMS RPN proposals
  proposal_logits(N,)  float32 objectness
  det_boxes      (D, 4), det_scores (D,), det_classes (D,) int64
  pred_masks     (D, 28, 28) float32 mask-head probabilities   [optional]
  pred_planes    (D, 3)                                        [optional]
  pred_rot_axis  (D, 3), pred_tran_axis (D, 2)                 [optional]
  depth          (480, 640) float32                            [optional]

`compare_goldens` runs the jax model's `inference_probe` on the stored image
and reports per-stage error statistics.  Detections are greedily matched by
box IoU (score order) before the per-field errors, so a benign NMS ordering
difference doesn't read as a parity failure.

Reference stages mirrored: `modeling/meta_arch/planercnn.py:148-184`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

FEATURE_KEYS = ("p2", "p3", "p4", "p5", "p6")


def save_goldens(path: str, goldens: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **goldens)


def load_goldens(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None] - inter
    iou = inter / np.clip(union, 1e-9, None)
    # degenerate (zero-area) boxes: treat coincident corners as a match so
    # random-init self-consistency checks don't spuriously fail
    corner_close = np.all(np.abs(a[:, None] - b[None]) < 1e-3, axis=-1)
    return np.where(union <= 1e-9, corner_close.astype(iou.dtype), iou)


def match_detections(ref_boxes: np.ndarray, out_boxes: np.ndarray,
                     iou_thresh: float = 0.7):
    """Greedy IoU matching; returns (ref_idx, out_idx) index arrays."""
    if len(ref_boxes) == 0 or len(out_boxes) == 0:
        return np.zeros(0, int), np.zeros(0, int)
    iou = _box_iou(ref_boxes, out_boxes)
    ref_idx, out_idx = [], []
    used = np.zeros(len(out_boxes), bool)
    for i in range(len(ref_boxes)):
        j = int(np.argmax(np.where(used, -1.0, iou[i])))
        if iou[i, j] >= iou_thresh and not used[j]:
            used[j] = True
            ref_idx.append(i)
            out_idx.append(j)
    return np.asarray(ref_idx, int), np.asarray(out_idx, int)


def run_probe(config, variables, image_bgr: np.ndarray) -> Dict[str, Any]:
    """Run the jax model's probe on one raw BGR uint8 frame."""
    import jax
    import jax.numpy as jnp

    from ..models.planercnn import PlaneRCNN
    from ..ops.preprocess import preprocess_images

    model = PlaneRCNN(config)

    @jax.jit
    def probe(v, frames):
        images = preprocess_images(
            frames, config.input.pixel_mean, config.input.pixel_std,
            height=config.input.height, width=config.input.width,
            size_divisibility=config.input.size_divisibility)
        return model.apply(v, images, method=PlaneRCNN.inference_probe)

    frames = jnp.asarray(image_bgr[None].astype(np.float32))
    out = probe(variables, frames)
    return jax.tree_util.tree_map(np.asarray, out)


def compare_goldens(goldens: Dict[str, np.ndarray], config, variables,
                    score_thresh: float = 0.05) -> Dict[str, float]:
    """Per-stage parity report: {stage: max abs err (or stat)}."""
    probe = run_probe(config, variables, goldens["image"])
    report: Dict[str, float] = {}

    for k in FEATURE_KEYS:
        if k not in goldens:
            continue
        ref = goldens[k]                       # (C, H, W)
        ours = probe["features"][k][0].transpose(2, 0, 1)
        if ref.shape != ours.shape:
            report[f"feat_{k}_max_err"] = float("inf")
            continue
        report[f"feat_{k}_max_err"] = float(np.abs(ref - ours).max())

    if "proposal_boxes" in goldens:
        ref_boxes = goldens["proposal_boxes"]
        valid = probe["proposal_valid"][0]
        ours = probe["proposal_boxes"][0][valid]
        n = min(len(ref_boxes), len(ours), 100)  # top-100 by score order
        ri, oi = match_detections(ref_boxes[:n], ours[:n], iou_thresh=0.9)
        report["proposal_top100_match_frac"] = len(ri) / max(n, 1)

    dets = probe["detections"]
    keep = dets.valid[0] & (dets.scores[0] > score_thresh)
    out_boxes = dets.boxes[0][keep]
    ref_keep = goldens["det_scores"] > score_thresh
    ref_boxes = goldens["det_boxes"][ref_keep]
    ri, oi = match_detections(ref_boxes, out_boxes)
    report["det_ref_count"] = float(len(ref_boxes))
    report["det_out_count"] = float(len(out_boxes))
    report["det_match_frac"] = len(ri) / max(len(ref_boxes), 1)
    if len(ri):
        report["det_box_max_err"] = float(
            np.abs(ref_boxes[ri] - out_boxes[oi]).max())
        report["det_score_max_err"] = float(np.abs(
            goldens["det_scores"][ref_keep][ri] - dets.scores[0][keep][oi]).max())
        for field, key in (("pred_masks", "masks"), ("pred_planes", "planes"),
                           ("pred_rot_axis", "rot_axis"),
                           ("pred_tran_axis", "tran_axis")):
            if field in goldens and getattr(dets, key) is not None:
                ref_v = goldens[field][ref_keep][ri]
                out_v = getattr(dets, key)[0][keep][oi]
                report[f"{key}_max_err"] = float(np.abs(ref_v - out_v).max())

    if "depth" in goldens and probe.get("depth") is not None:
        report["depth_max_err"] = float(
            np.abs(goldens["depth"] - probe["depth"][0]).max())
    return report


# --------------------------------------------------------------------------- #
# The full detectron2 PlaneRCNN state-dict schema (every key the shipped
# `model_final.pth` carries), used to validate porter coverage end to end
# without the real weights.
# --------------------------------------------------------------------------- #

def full_d2_key_shapes(num_classes: int = 2) -> Dict[str, tuple]:
    """{d2 state-dict key: shape} for PlaneRCNN R50-FPN with mask + plane +
    axis + depth heads (reference `config/config.yaml`)."""
    shapes: Dict[str, tuple] = {}

    def conv(key, o, i, k):
        shapes[f"{key}.weight"] = (o, i, k, k)

    def convb(key, o, i, k):
        conv(key, o, i, k)
        shapes[f"{key}.bias"] = (o,)

    def frozen_bn(key, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{key}.{s}"] = (c,)

    def torch_bn(key, c):
        frozen_bn(key, c)
        shapes[f"{key}.num_batches_tracked"] = ()

    def linear(key, o, i):
        shapes[f"{key}.weight"] = (o, i)
        shapes[f"{key}.bias"] = (o,)

    # backbone stem
    conv("backbone.bottom_up.stem.conv1", 64, 3, 7)
    frozen_bn("backbone.bottom_up.stem.conv1.norm", 64)
    # res2..res5: (n_blocks, width, in_channels)
    stage_spec = {2: (3, 64, 64), 3: (4, 128, 256),
                  4: (6, 256, 512), 5: (3, 512, 1024)}
    for s, (blocks, width, cin) in stage_spec.items():
        out = width * 4
        for b in range(blocks):
            base = f"backbone.bottom_up.res{s}.{b}"
            bin_ = cin if b == 0 else out
            if b == 0:
                conv(f"{base}.shortcut", out, bin_, 1)
                frozen_bn(f"{base}.shortcut.norm", out)
            conv(f"{base}.conv1", width, bin_, 1)
            frozen_bn(f"{base}.conv1.norm", width)
            conv(f"{base}.conv2", width, width, 3)
            frozen_bn(f"{base}.conv2.norm", width)
            conv(f"{base}.conv3", out, width, 1)
            frozen_bn(f"{base}.conv3.norm", out)
    # fpn
    for lvl, cin in ((2, 256), (3, 512), (4, 1024), (5, 2048)):
        convb(f"backbone.fpn_lateral{lvl}", 256, cin, 1)
        convb(f"backbone.fpn_output{lvl}", 256, 256, 3)
    # rpn (3 anchors per location)
    convb("proposal_generator.rpn_head.conv", 256, 256, 3)
    convb("proposal_generator.rpn_head.objectness_logits", 3, 256, 1)
    convb("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1)
    # box head + predictor
    linear("roi_heads.box_head.fc1", 1024, 256 * 7 * 7)
    linear("roi_heads.box_head.fc2", 1024, 1024)
    linear("roi_heads.box_predictor.cls_score", num_classes + 1, 1024)
    linear("roi_heads.box_predictor.bbox_pred", num_classes * 4, 1024)
    # mask head (class-agnostic)
    for i in range(1, 5):
        convb(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    shapes["roi_heads.mask_head.deconv.weight"] = (256, 256, 2, 2)
    shapes["roi_heads.mask_head.deconv.bias"] = (256,)
    convb("roi_heads.mask_head.predictor", 1, 256, 1)
    # plane head
    for i in range(1, 5):
        convb(f"roi_heads.plane_head.plane_conv{i}", 256, 256, 3)
    linear("roi_heads.plane_head.plane_fc1", 1024, 256 * 14 * 14)
    linear("roi_heads.plane_head.param_pred", 3, 1024)
    # axis head (twin towers, axis_head.py:42-82)
    for rt in ("R", "T"):
        for i in range(1, 5):
            convb(f"roi_heads.axis_head.axis_{rt}_conv{i}", 256, 256, 3)
        linear(f"roi_heads.axis_head.axis_{rt}_fc1", 1024, 256 * 14 * 14)
    linear("roi_heads.axis_head.rotation", 2, 1024)
    linear("roi_heads.axis_head.offset", 1, 1024)
    linear("roi_heads.axis_head.translation", 2, 1024)
    # depth head (depth_head.py:58-68: conv{i} = Seq(Conv, BN),
    # deconv{i} = Seq(Upsample, Conv, BN))
    for i in range(1, 6):
        cin = 256 if i <= 5 else 256
        convb(f"depth_head.conv{i}.0", 128, 256, 3)
        torch_bn(f"depth_head.conv{i}.1", 128)
    deconv_spec = {1: (128, 128), 2: (256, 128), 3: (256, 128),
                   4: (256, 128), 5: (256, 64)}
    for i, (cin, cout) in deconv_spec.items():
        convb(f"depth_head.deconv{i}.1", cout, cin, 3)
        torch_bn(f"depth_head.deconv{i}.2", cout)
    convb("depth_head.depth_pred", 1, 64, 3)
    # anchor-generator buffers present in real checkpoints (constants here)
    for i, n in enumerate((3, 3, 3, 3, 3)):
        shapes[f"proposal_generator.anchor_generator.cell_anchors.{i}"] = (n, 4)
    return shapes
