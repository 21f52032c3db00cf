"""d2-free pure-torch oracle of the reference PlaneRCNN inference forward.

Reconstructs the reference model end to end in plain torch (CPU) so the jax
stack can be compared whole-model, not just layer by layer:

    backbone (R50-FPN, FrozenBN, stride_in_1x1) -> RPN proposal selection ->
    FastRCNN box inference (class-wise NMS) -> mask/plane/axis cascade on the
    final boxes -> depth decoder.

Behavioral sources (reconstructed from the reference's documented behavior,
NOT copied code):
  * meta-arch eval path: `/root/reference/articulation3d/articulation3d/
    modeling/meta_arch/planercnn.py:125-184`
  * ROI cascade: `modeling/roi_heads/roi_heads.py:119-165`
  * plane head: `modeling/roi_heads/plane_head.py:15-93`
  * axis head twin towers: `modeling/roi_heads/axis_head.py:95-132`
  * depth decoder: `modeling/depth_net/depth_head.py:49-103`
  * detectron2 semantics (anchors, Box2BoxTransform, find_top_rpn_proposals,
    fast_rcnn_inference, FrozenBatchNorm2d, FPN LastLevelMaxPool) per the
    configs pinned in `config/config.yaml:38-297`.

Parameter/buffer names exactly match the released checkpoint schema
(`articulation3d_tpu.evaluation.goldens.full_d2_key_shapes`), so a d2-style
state dict loads into this oracle with `load_state_dict` AND ports into the
flax model through `port_detectron2_state_dict` — one weight source, two
independent forward implementations.

ROI pooling reuses `tests.reference_impls.roi_align_np` (the numpy
ROIAlign written from the op definition and validated against torch
grid_sample) — the oracle's purpose is whole-model composition parity.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from reference_impls import roi_align_np

SCALE_CLAMP = math.log(1000.0 / 16.0)


# --------------------------------------------------------------------------- #
# building blocks
# --------------------------------------------------------------------------- #
class FrozenBN(nn.Module):
    """d2 FrozenBatchNorm2d: stats stored as buffers, eps 1e-5."""

    def __init__(self, c: int, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class ConvNorm(nn.Conv2d):
    """d2 Conv2d-with-norm: the norm is a CHILD of the conv (key `X.norm.*`)."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride=stride, padding=(k - 1) // 2,
                         bias=False)
        self.norm = FrozenBN(cout)

    def forward(self, x):
        return self.norm(super().forward(x))


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1, stride on the FIRST 1x1 (stride_in_1x1)."""

    def __init__(self, cin, width, cout, stride):
        super().__init__()
        if stride != 1 or cin != cout:
            self.shortcut = ConvNorm(cin, cout, 1, stride)
        self.conv1 = ConvNorm(cin, width, 1, stride)
        self.conv2 = ConvNorm(width, width, 3, 1)
        self.conv3 = ConvNorm(width, cout, 1, 1)

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        sc = self.shortcut(x) if hasattr(self, "shortcut") else x
        return F.relu(out + sc)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = ConvNorm(3, 64, 7, 2)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, stride=2, padding=1)


class BottomUp(nn.Module):
    """R50: stem + res2..res5, returning all stage outputs."""

    def __init__(self):
        super().__init__()
        self.stem = Stem()
        spec = {2: (3, 64, 64), 3: (4, 128, 256), 4: (6, 256, 512),
                5: (3, 512, 1024)}
        for s, (blocks, width, cin) in spec.items():
            cout = width * 4
            mods = []
            for b in range(blocks):
                stride = 1 if (s == 2 or b > 0) else 2
                mods.append(Bottleneck(cin if b == 0 else cout, width, cout,
                                       stride))
            setattr(self, f"res{s}", nn.Sequential(*mods))

    def forward(self, x):
        x = self.stem(x)
        outs = {}
        for s in (2, 3, 4, 5):
            x = getattr(self, f"res{s}")(x)
            outs[f"res{s}"] = x
        return outs


class Backbone(nn.Module):
    """R50-FPN with LastLevelMaxPool p6 (keys `backbone.fpn_lateral{l}` etc)."""

    def __init__(self):
        super().__init__()
        self.bottom_up = BottomUp()
        for lvl, cin in ((2, 256), (3, 512), (4, 1024), (5, 2048)):
            setattr(self, f"fpn_lateral{lvl}", nn.Conv2d(cin, 256, 1))
            setattr(self, f"fpn_output{lvl}", nn.Conv2d(256, 256, 3, padding=1))

    def forward(self, x):
        bu = self.bottom_up(x)
        laterals = [getattr(self, f"fpn_lateral{l}")(bu[f"res{l}"])
                    for l in (2, 3, 4, 5)]
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = F.interpolate(merged[i + 1], scale_factor=2, mode="nearest")
            up = up[:, :, :laterals[i].shape[2], :laterals[i].shape[3]]
            merged[i] = laterals[i] + up
        feats = {f"p{i + 2}": getattr(self, f"fpn_output{i + 2}")(m)
                 for i, m in enumerate(merged)}
        feats["p6"] = F.max_pool2d(feats["p5"], 1, stride=2)
        return feats


class RPNHead(nn.Module):
    def __init__(self, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(256, 256, 3, padding=1)
        self.objectness_logits = nn.Conv2d(256, num_anchors, 1)
        self.anchor_deltas = nn.Conv2d(256, num_anchors * 4, 1)

    def forward(self, feats: Sequence[torch.Tensor]):
        logits, deltas = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            logits.append(self.objectness_logits(t))
            deltas.append(self.anchor_deltas(t))
        return logits, deltas


class ProposalGenerator(nn.Module):
    def __init__(self):
        super().__init__()
        self.rpn_head = RPNHead()


class BoxHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(256 * 7 * 7, 1024)
        self.fc2 = nn.Linear(1024, 1024)

    def forward(self, x):  # (R, 256, 7, 7)
        x = x.flatten(1)
        x = F.relu(self.fc1(x))
        return F.relu(self.fc2(x))


class BoxPredictor(nn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.cls_score = nn.Linear(1024, num_classes + 1)
        self.bbox_pred = nn.Linear(1024, num_classes * 4)


class MaskHead(nn.Module):
    def __init__(self):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"mask_fcn{i}", nn.Conv2d(256, 256, 3, padding=1))
        self.deconv = nn.ConvTranspose2d(256, 256, 2, stride=2)
        self.predictor = nn.Conv2d(256, 1, 1)

    def forward(self, x):
        for i in range(1, 5):
            x = F.relu(getattr(self, f"mask_fcn{i}")(x))
        x = F.relu(self.deconv(x))
        return self.predictor(x)          # logits (R, 1, 28, 28)


class PlaneHead(nn.Module):
    def __init__(self):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"plane_conv{i}", nn.Conv2d(256, 256, 3, padding=1))
        self.plane_fc1 = nn.Linear(256 * 14 * 14, 1024)
        self.param_pred = nn.Linear(1024, 3)

    def forward(self, x, normal_only=True):
        for i in range(1, 5):
            x = F.relu(getattr(self, f"plane_conv{i}")(x))
        x = F.relu(self.plane_fc1(x.flatten(1)))
        p = self.param_pred(x)
        if normal_only:
            p = p / p.norm(dim=-1, keepdim=True).clamp(min=1e-12)
        return p


class AxisHead(nn.Module):
    def __init__(self):
        super().__init__()
        for rt in ("R", "T"):
            for i in range(1, 5):
                setattr(self, f"axis_{rt}_conv{i}",
                        nn.Conv2d(256, 256, 3, padding=1))
            setattr(self, f"axis_{rt}_fc1", nn.Linear(256 * 14 * 14, 1024))
        self.rotation = nn.Linear(1024, 2)
        self.offset = nn.Linear(1024, 1)
        self.translation = nn.Linear(1024, 2)

    def _tower(self, x, rt):
        for i in range(1, 5):
            x = F.relu(getattr(self, f"axis_{rt}_conv{i}")(x))
        return F.relu(getattr(self, f"axis_{rt}_fc1")(x.flatten(1)))

    def forward(self, x):
        xr = self._tower(x, "R")
        xt = self._tower(x, "T")
        sc = self.rotation(xr)
        sc = sc / sc.norm(dim=-1, keepdim=True).clamp(min=1e-12)
        rot = torch.cat([sc, self.offset(xr)], dim=-1)
        tr = self.translation(xt)
        tran = tr / tr.norm(dim=-1, keepdim=True).clamp(min=1e-12)
        return rot, tran


class ROIHeads(nn.Module):
    def __init__(self):
        super().__init__()
        self.box_head = BoxHead()
        self.box_predictor = BoxPredictor()
        self.mask_head = MaskHead()
        self.plane_head = PlaneHead()
        self.axis_head = AxisHead()


class DepthHead(nn.Module):
    """FPN depth decoder (reference depth_head.py:49-103); the lane->deconv
    wiring follows the reference, generalized to arbitrary pyramid sizes by
    resizing each deconv output onto the next skip's grid (a no-op at the
    reference's fixed 480x640)."""

    def __init__(self, out_h=480, out_w=640):
        super().__init__()
        self.out_h, self.out_w = out_h, out_w
        for i in range(1, 6):
            setattr(self, f"conv{i}", nn.Sequential(
                nn.Conv2d(256, 128, 3, padding=1),
                nn.BatchNorm2d(128, eps=1e-3, momentum=0.01)))
        spec = {1: (128, 128), 2: (256, 128), 3: (256, 128), 4: (256, 128),
                5: (256, 64)}
        for i, (cin, cout) in spec.items():
            setattr(self, f"deconv{i}", nn.Sequential(
                nn.Upsample(scale_factor=2, mode="nearest"),
                nn.Conv2d(cin, cout, 3, padding=1),
                nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01)))
        self.depth_pred = nn.Conv2d(64, 1, 3, padding=1)

    def _lane(self, i, x):
        seq = getattr(self, f"conv{i}")
        return F.leaky_relu(seq[1](seq[0](x)), 0.01)

    def _deconv(self, i, x, target_hw=None):
        seq = getattr(self, f"deconv{i}")
        x = seq[0](x)
        if target_hw is not None and tuple(x.shape[2:]) != tuple(target_hw):
            x = F.interpolate(x, size=target_hw, mode="bilinear",
                              align_corners=False)
        return F.relu(seq[2](seq[1](x)))

    def forward(self, feats: Dict[str, torch.Tensor]):
        lanes = {n: self._lane(i + 1, feats[n])
                 for i, n in enumerate(("p6", "p5", "p4", "p3", "p2"))}

        def hw(n):
            return tuple(feats[n].shape[2:])

        x = self._deconv(1, lanes["p6"])
        x = F.interpolate(x, size=hw("p5"), mode="bilinear",
                          align_corners=False)
        x = self._deconv(2, torch.cat([lanes["p5"], x], 1), hw("p4"))
        x = self._deconv(3, torch.cat([lanes["p4"], x], 1), hw("p3"))
        x = self._deconv(4, torch.cat([lanes["p3"], x], 1), hw("p2"))
        x = self._deconv(5, torch.cat([lanes["p2"], x], 1))
        x = self.depth_pred(x)
        x = F.interpolate(x, size=(self.out_h, self.out_w), mode="bilinear",
                          align_corners=False)
        return x[:, 0]


# --------------------------------------------------------------------------- #
# box utilities (d2 semantics)
# --------------------------------------------------------------------------- #
def cell_anchors(size: float, ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    out = []
    for ar in ratios:
        w = math.sqrt(size * size / ar)
        h = ar * w
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def level_anchors(fh: int, fw: int, stride: int, size: float) -> np.ndarray:
    cell = cell_anchors(size)
    sx = np.arange(fw, dtype=np.float32) * stride
    sy = np.arange(fh, dtype=np.float32) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx, gy, gx, gy], -1)                  # (H, W, 4)
    return (shifts[:, :, None] + cell[None, None]).reshape(-1, 4)


def decode(deltas: np.ndarray, boxes: np.ndarray, weights) -> np.ndarray:
    """Box2BoxTransform.apply_deltas, (..., 4) each."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = np.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2],
                    -1)


def clip(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    out = boxes.copy()
    out[..., 0::2] = np.clip(out[..., 0::2], 0, w)
    out[..., 1::2] = np.clip(out[..., 1::2], 0, h)
    return out


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(
        x[:, 3] - x[:, 1], 0, None)
    union = area(a)[:, None] + area(b)[None] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS; returns kept indices in descending-score order.
    Suppression is strict `iou > thresh` (torchvision convention)."""
    order = np.argsort(-scores, kind="stable")
    iou = iou_matrix(boxes, boxes)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive[iou[i] > thresh] = False
        alive[i] = False
    return np.asarray(keep, int)


def batched_nms(boxes, scores, classes, thresh):
    """Class-offset trick, same as d2 batched_nms / the jax port."""
    if len(boxes) == 0:
        return np.zeros(0, int)
    max_coord = boxes.max() + 1.0
    shifted = boxes + (classes.astype(boxes.dtype) * max_coord)[:, None]
    return nms(shifted, scores, thresh)


def assign_levels(boxes: np.ndarray) -> np.ndarray:
    area = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None)
    lvl = np.floor(4 + np.log2(np.sqrt(area) / 224.0 + 1e-8))
    return np.clip(lvl, 2, 5).astype(int)


def multilevel_pool(feats: Dict[str, torch.Tensor], boxes: np.ndarray,
                    resolution: int, sampling_ratio: int,
                    aligned: bool) -> torch.Tensor:
    """FPN ROIAlign via the validated numpy reference (NCHW in/out)."""
    if len(boxes) == 0:
        return torch.zeros(0, 256, resolution, resolution)
    levels = assign_levels(boxes)
    maps = {l: feats[f"p{l}"][0].permute(1, 2, 0).detach().numpy()
            for l in range(2, 6)}
    out = np.zeros((len(boxes), resolution, resolution, 256), np.float32)
    for l in range(2, 6):
        sel = np.nonzero(levels == l)[0]
        if len(sel) == 0:
            continue
        pooled = roi_align_np(maps[l], boxes[sel], 1.0 / (2 ** l),
                              resolution, sampling_ratio, aligned)
        out[sel] = pooled
    return torch.from_numpy(out).permute(0, 3, 1, 2)


# --------------------------------------------------------------------------- #
# the oracle
# --------------------------------------------------------------------------- #
class PlaneRCNNOracle(nn.Module):
    """Reference PlaneRCNN inference in plain torch, d2 checkpoint schema."""

    STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    SIZES = {"p2": 32.0, "p3": 64.0, "p4": 128.0, "p5": 256.0, "p6": 512.0}

    def __init__(self, *, pre_nms_topk=1000, post_nms_topk=1000,
                 rpn_nms_thresh=0.7, score_thresh=0.7, nms_thresh=0.5,
                 detections_per_image=100, depth_hw=(480, 640)):
        super().__init__()
        self.backbone = Backbone()
        self.proposal_generator = ProposalGenerator()
        self.roi_heads = ROIHeads()
        self.depth_head = DepthHead(*depth_hw)
        self.pre_nms_topk = pre_nms_topk
        self.post_nms_topk = post_nms_topk
        self.rpn_nms_thresh = rpn_nms_thresh
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.detections_per_image = detections_per_image

    @torch.no_grad()
    def proposals(self, feats, image_h, image_w):
        """d2 find_top_rpn_proposals: per-level pre-NMS topk + NMS, global
        post-NMS topk by objectness."""
        names = ("p2", "p3", "p4", "p5", "p6")
        logits, deltas = self.proposal_generator.rpn_head(
            [feats[n] for n in names])
        all_boxes, all_scores = [], []
        for n, lg, dl in zip(names, logits, deltas):
            fh, fw = lg.shape[2:]
            # (A, H, W) -> row-major (y, x, anchor) to match anchor order
            sc = lg[0].permute(1, 2, 0).reshape(-1).numpy()
            de = dl[0].permute(1, 2, 0).reshape(-1, 4).numpy()
            anchors = level_anchors(fh, fw, self.STRIDES[n], self.SIZES[n])
            k = min(self.pre_nms_topk, len(sc))
            idx = np.argsort(-sc, kind="stable")[:k]
            boxes = clip(decode(de[idx], anchors[idx], (1.0, 1.0, 1.0, 1.0)),
                         image_h, image_w)
            ok = ((boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
                  & np.isfinite(boxes).all(-1))
            boxes, s = boxes[ok], sc[idx][ok]
            keep = nms(boxes, s, self.rpn_nms_thresh)
            all_boxes.append(boxes[keep])
            all_scores.append(s[keep])
        boxes = np.concatenate(all_boxes, 0)
        scores = np.concatenate(all_scores, 0)
        order = np.argsort(-scores, kind="stable")[:self.post_nms_topk]
        return boxes[order], scores[order]

    @torch.no_grad()
    def forward(self, image: torch.Tensor) -> Dict[str, np.ndarray]:
        """image: (1, 3, H, W) preprocessed (normalized, padded) BGR."""
        self.eval()
        h, w = image.shape[2:]
        feats = self.backbone(image)
        prop_boxes, prop_scores = self.proposals(feats, h, w)

        pooled = multilevel_pool(feats, prop_boxes, 7, 0, aligned=True)
        box_feats = self.roi_heads.box_head(pooled)
        scores = F.softmax(self.roi_heads.box_predictor.cls_score(box_feats),
                           -1).numpy()[:, :2]                     # (R, C)
        deltas = self.roi_heads.box_predictor.bbox_pred(
            box_feats).numpy().reshape(-1, 2, 4)
        boxes = clip(decode(deltas, prop_boxes[:, None, :],
                            (10.0, 10.0, 5.0, 5.0)), h, w)        # (R, C, 4)

        flat_boxes = boxes.reshape(-1, 4)
        flat_scores = scores.reshape(-1)
        flat_classes = np.tile(np.arange(2), len(boxes))
        sel = np.nonzero(flat_scores > self.score_thresh)[0]
        keep = batched_nms(flat_boxes[sel], flat_scores[sel],
                           flat_classes[sel], self.nms_thresh)
        keep = sel[keep]
        order = np.argsort(-flat_scores[keep], kind="stable")
        keep = keep[order][:self.detections_per_image]

        det_boxes = flat_boxes[keep]
        out = {
            "proposal_boxes": prop_boxes,
            "proposal_scores": prop_scores,
            "features": {k: v.numpy() for k, v in feats.items()},
            "boxes": det_boxes,
            "scores": flat_scores[keep],
            "classes": flat_classes[keep],
        }

        mp = multilevel_pool(feats, det_boxes, 14, 2, aligned=False)
        out["masks"] = torch.sigmoid(
            self.roi_heads.mask_head(mp))[:, 0].numpy()
        pp = multilevel_pool(feats, det_boxes, 14, 0, aligned=False)
        out["planes"] = self.roi_heads.plane_head(pp).numpy()
        rot, tran = self.roi_heads.axis_head(pp)
        out["rot_axis"] = rot.numpy()
        out["tran_axis"] = tran.numpy()
        out["depth"] = self.depth_head(feats).numpy()[0]
        return out


def he_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """Synthetic full-schema d2 state dict with He-ish scaling so activations
    stay O(1) through the 50-layer trunk (pure-random 0.05x weights collapse
    all activations to ~0 and make every parity comparison trivially pass).

    Deterministic from `seed` via np.random.RandomState, so the goldens
    fixture producer (tools/make_goldens_oracle.py) and its consumer test can
    regenerate the SAME weights without committing a 180MB .pth.
    """
    from articulation3d_tpu.evaluation.goldens import full_d2_key_shapes

    rs = np.random.RandomState(seed)
    out = {}
    for k, s in full_d2_key_shapes().items():
        if k.endswith("running_var"):
            out[k] = rs.uniform(0.5, 1.5, s).astype(np.float32)
        elif k.endswith("running_mean"):
            out[k] = (rs.randn(*s) * 0.1).astype(np.float32)
        elif ".norm.weight" in k or (k.endswith(".1.weight") and "depth_head" in k) \
                or (k.endswith(".2.weight") and "depth_head" in k):
            out[k] = rs.uniform(0.6, 1.1, s).astype(np.float32)
        elif k.endswith("num_batches_tracked"):
            out[k] = np.zeros(s, np.int64)
        elif k.endswith(".bias") or ".norm.bias" in k:
            out[k] = (rs.randn(*s) * 0.05).astype(np.float32)
        elif len(s) == 4:                       # conv / deconv kernels
            fan_in = s[1] * s[2] * s[3]
            if "deconv" in k and "depth_head" not in k:
                fan_in = s[0] * s[2] * s[3]     # ConvTranspose (in, out, k, k)
            out[k] = (rs.randn(*s) * 0.8 * np.sqrt(2.0 / fan_in)).astype(np.float32)
        elif len(s) == 2:                       # linear (out, in)
            out[k] = (rs.randn(*s) * np.sqrt(2.0 / s[1])).astype(np.float32)
        else:                                   # anchor buffers etc
            out[k] = rs.randn(*s).astype(np.float32)
        # box-regression deltas must stay small: He-scale deltas shift
        # proposals ~anchor-widths outside the tiny test image, so every box
        # clips to zero area and both models emit 0 proposals/detections
        # ... and classification logits must not saturate the softmax to a
        # hard one-hot (the box-head features reach std ~400, so even mildly
        # scaled cls weights give |logit| > 10: every proposal scores 1.0
        # background and no detection survives)
        if "anchor_deltas" in k:
            out[k] = (out[k] * 0.02).astype(np.float32)
        elif "bbox_pred" in k or "cls_score" in k:
            out[k] = (out[k] * 0.002).astype(np.float32)
        # depth-head BNs run on RANDOM running stats (eval mode), so they
        # don't normalize actual activations; the He conv gain compounds to
        # ~1e15 over the 15-layer decoder.  Damp convs so the per-layer gain
        # is ~1 and the depth output stays O(1)-comparable.
        elif "depth_head" in k and len(s) == 4:
            out[k] = (out[k] * 0.1).astype(np.float32)
    return out


def bias_state_dict_for_detections(sd: Dict[str, np.ndarray],
                                   objectness: float = 4.0,
                                   foreground: float = 6.0
                                   ) -> Dict[str, np.ndarray]:
    """d2-state-dict twin of `utils.debug_weights.bias_for_detections`:
    lift RPN objectness + foreground class logits so a population of
    detections survives scoring/NMS (used for the non-empty-detections
    goldens fixture — `tools/make_goldens_oracle.py --bias`)."""
    sd = dict(sd)
    k_obj = "proposal_generator.rpn_head.objectness_logits.bias"
    k_cls = "roi_heads.box_predictor.cls_score.bias"
    sd[k_obj] = (sd[k_obj] + objectness).astype(np.float32)
    cls = sd[k_cls].copy()
    cls[:-1] += foreground                 # background is the LAST index
    sd[k_cls] = cls.astype(np.float32)
    return sd


def preprocess(image_bgr: np.ndarray, pixel_mean=(103.53, 116.28, 123.675),
               pixel_std=(1.0, 1.0, 1.0), size_divisibility=32) -> torch.Tensor:
    """Reference preprocess_image (planercnn.py:188-196): normalize, pad."""
    x = image_bgr.astype(np.float32)
    x = (x - np.asarray(pixel_mean, np.float32)) / np.asarray(pixel_std,
                                                              np.float32)
    h, w = x.shape[:2]
    d = size_divisibility
    ph, pw = (d - h % d) % d, (d - w % d) % d
    if ph or pw:
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)))
    return torch.from_numpy(x).permute(2, 0, 1)[None]
