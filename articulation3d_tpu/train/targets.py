"""Target assignment, proposal sampling, and losses — fully jitted.

Reproduces detectron2's two-stage training semantics used by the reference:

  * RPN anchor matching (`Matcher([0.3, 0.7], [0, -1, 1],
    allow_low_quality_matches=True)`) and 256/image 50% positive subsampling
    (`config/config.yaml:284-297`);
  * ROI proposal labeling (IoU 0.5 threshold, no low-quality matches),
    GT-append (`PROPOSAL_APPEND_GT`), and 512/image 25% positive sampling
    (`config/config.yaml:209-226`);
  * FastRCNN losses (softmax CE + smooth-L1 box reg normalized by the total
    sampled count), RPN losses (normalized by batch_size_per_image x images);
  * mask BCE on 28x28 crops of the GT bitmasks (d2 `crop_and_resize` ==
    aligned ROIAlign on the mask);
  * plane smooth-L1 (sum / num_fg, reference `plane_head.py:96-124`);
  * axis losses with per-GT valid bits and the translation double-angle space
    (reference `axis_head.py:151-201`).

Sampling randomness uses `jax.random` with explicit keys — random
permutations are realized as uniform-priority top-k, matching d2's
`subsample_labels` distribution.

GT comes in as fixed-capacity padded arrays per image:
  gt_boxes (G, 4), gt_classes (G,), gt_valid (G,), gt_masks (G, H, W),
  gt_planes (G, 3), gt_rot_axis (G, 4), gt_tran_axis (G, 4)
(axis vectors are the codec outputs [sin, cos, offset, valid]).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.heads import double_angle
from ..ops.box_ops import encode_deltas, pairwise_iou, smooth_l1_loss
from ..ops.roi_align import _sample_coords


# --------------------------------------------------------------------------- #
# matchers
# --------------------------------------------------------------------------- #

def match_anchors(iou: jnp.ndarray, gt_valid: jnp.ndarray,
                  low_thresh: float, high_thresh: float,
                  allow_low_quality: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 Matcher.

    Args:
      iou: (A, G) IoU between anchors/proposals and (padded) GT boxes.
      gt_valid: (G,) mask of real GT rows.
    Returns:
      matched_idx: (A,) best GT index per anchor;
      labels: (A,) 1 = positive, 0 = negative, -1 = ignore.
    """
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched_vals = jnp.max(iou, axis=1)
    matched_idx = jnp.argmax(iou, axis=1)

    labels = jnp.where(matched_vals >= high_thresh, 1,
                       jnp.where(matched_vals >= low_thresh, -1, 0))

    if allow_low_quality:
        # anchors sharing the per-GT max IoU become positive (with ties),
        # d2 `set_low_quality_matches_`
        per_gt_max = jnp.max(jnp.where(gt_valid[None, :], iou, -1.0), axis=0)  # (G,)
        is_best = (iou == per_gt_max[None, :]) & gt_valid[None, :] & (per_gt_max[None, :] > 0)
        labels = jnp.where(jnp.any(is_best, axis=1), 1, labels)

    # no valid gt at all -> everything negative (d2 returns zeros)
    any_gt = jnp.any(gt_valid)
    labels = jnp.where(any_gt, labels, 0)
    return matched_idx, labels


def subsample_labels(labels: jnp.ndarray, num_samples: int,
                     positive_fraction: float, key: jax.Array
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """d2 `subsample_labels`: random positives up to num*frac, fill negatives.

    Returns (pos_mask, neg_mask) — boolean masks over the label vector with
    |pos| + |neg| <= num_samples, sampled uniformly without replacement.
    """
    n = labels.shape[0]
    kp, kn = jax.random.split(key)
    is_pos = labels == 1
    is_neg = labels == 0

    num_pos_cap = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos), num_pos_cap)
    num_neg = jnp.minimum(jnp.sum(is_neg), num_samples - num_pos)

    rank_pos = jax.random.uniform(kp, (n,)) + (~is_pos) * 2.0
    order_pos = jnp.argsort(rank_pos)
    pos_sel = jnp.zeros(n, bool).at[order_pos].set(jnp.arange(n) < num_pos)

    rank_neg = jax.random.uniform(kn, (n,)) + (~is_neg) * 2.0
    order_neg = jnp.argsort(rank_neg)
    neg_sel = jnp.zeros(n, bool).at[order_neg].set(jnp.arange(n) < num_neg)
    return pos_sel & is_pos, neg_sel & is_neg


# --------------------------------------------------------------------------- #
# RPN losses
# --------------------------------------------------------------------------- #

def per_image_keys(key: jax.Array, b: int) -> jnp.ndarray:
    """Normalize an RNG argument to per-image keys (B, 2).

    Accepts either a scalar PRNG key (split here) or pre-split per-image
    keys (passed through).  The multi-device `shard_map` train step presplits
    keys from the GLOBAL batch index so every image samples identically
    regardless of how the batch is sharded over devices."""
    key = jnp.asarray(key)
    if key.ndim == 2:
        assert key.shape[0] == b, (key.shape, b)
        return key
    return jax.random.split(key, b)


def rpn_losses(rpn_raw: Dict, gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
               key: jax.Array, cfg: Config) -> Dict[str, jnp.ndarray]:
    """RPN objectness + anchor regression loss over the batch.

    rpn_raw: {"logits": [per-level (B,H,W,A)], "deltas": [(B,H,W,4A)],
              "anchors": [(HWA,4)]}.  `key`: scalar key or per-image (B, 2).
    """
    rcfg = cfg.model.rpn
    anchors = jnp.concatenate(rpn_raw["anchors"], axis=0)          # (A, 4)
    b = rpn_raw["logits"][0].shape[0]
    logits = jnp.concatenate(
        [l.reshape(b, -1) for l in rpn_raw["logits"]], axis=1)      # (B, A)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in rpn_raw["deltas"]], axis=1)   # (B, A, 4)

    def per_image(gt_b, gt_v, k):
        iou = pairwise_iou(anchors, gt_b)
        matched_idx, labels = match_anchors(
            iou, gt_v, rcfg.iou_thresholds[0], rcfg.iou_thresholds[1],
            allow_low_quality=True)
        pos, neg = subsample_labels(labels, rcfg.batch_size_per_image,
                                    rcfg.positive_fraction, k)
        tgt = encode_deltas(anchors, gt_b[matched_idx], rcfg.bbox_reg_weights)
        return pos, neg, tgt

    keys = per_image_keys(key, b)
    pos, neg, tgt = jax.vmap(per_image)(gt_boxes, gt_valid, keys)

    normalizer = float(rcfg.batch_size_per_image * b)
    obj_target = pos.astype(jnp.float32)
    sampled = pos | neg
    # binary CE with logits, summed over sampled anchors
    ce = jnp.maximum(logits, 0) - logits * obj_target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss_cls = jnp.sum(jnp.where(sampled, ce, 0.0)) / normalizer
    reg = smooth_l1_loss(deltas, tgt, rcfg.smooth_l1_beta)
    loss_reg = jnp.sum(jnp.where(pos[..., None], reg, 0.0)) / normalizer
    return {"loss_rpn_cls": loss_cls * rcfg.loss_weight,
            "loss_rpn_loc": loss_reg * rcfg.loss_weight}


# --------------------------------------------------------------------------- #
# ROI sampling
# --------------------------------------------------------------------------- #

class SampledROIs(NamedTuple):
    boxes: jnp.ndarray        # (B, S, 4)
    classes: jnp.ndarray      # (B, S) int — num_classes = background
    matched_idx: jnp.ndarray  # (B, S) index into GT rows
    is_sampled: jnp.ndarray   # (B, S) bool — real sampled proposal
    is_fg: jnp.ndarray        # (B, S) bool


def sample_rois(proposal_boxes: jnp.ndarray, proposal_valid: jnp.ndarray,
                gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                gt_valid: jnp.ndarray, key: jax.Array, cfg: Config) -> SampledROIs:
    """label_and_sample_proposals for the whole batch (B leading dim)."""
    hcfg = cfg.model.roi_heads
    s = hcfg.batch_size_per_image
    num_classes = hcfg.num_classes

    def per_image(pb, pv, gb, gc, gv, k):
        # PROPOSAL_APPEND_GT
        boxes = jnp.concatenate([pb, gb], axis=0)
        valid = jnp.concatenate([pv, gv], axis=0)
        iou = pairwise_iou(boxes, gb)
        iou = jnp.where(valid[:, None], iou, -1.0)
        matched_idx, labels = match_anchors(
            iou, gv, hcfg.iou_threshold, hcfg.iou_threshold,
            allow_low_quality=False)
        # d2: classes = gt class for positives, num_classes for negatives
        cls = jnp.where(labels == 1, gc[matched_idx], num_classes)
        # sampling treats label==1 as pos and label==0 as neg; invalid rows
        # must never be picked
        labels = jnp.where(valid, labels, -1)
        pos, neg = subsample_labels(labels, s, hcfg.positive_fraction, k)
        sampled = pos | neg
        # gather sampled rows to the front (priority: sampled first)
        order = jnp.argsort(~sampled, stable=True)
        take = order[:s]
        return (boxes[take], cls[take], matched_idx[take],
                sampled[take], pos[take])

    keys = per_image_keys(key, proposal_boxes.shape[0])
    out = jax.vmap(per_image)(proposal_boxes, proposal_valid, gt_boxes,
                              gt_classes, gt_valid, keys)
    return SampledROIs(*out)


# --------------------------------------------------------------------------- #
# detection losses
# --------------------------------------------------------------------------- #

def crop_gt_masks(gt_masks: jnp.ndarray, matched_idx: jnp.ndarray,
                  boxes: jnp.ndarray, mask_size: int,
                  chunk: int = 64) -> jnp.ndarray:
    """d2 BitMasks.crop_and_resize: aligned ROIAlign of each GT bitmask in
    its matched proposal box, thresholded at 0.5.  gt_masks: (G, H, W).

    TPU formulation: ROIAlign of a FULL-IMAGE single-channel map is a
    separable linear map, so each crop is two small MXU matmuls

        crop[s] = Ry[s] (P, H) @ mask[g(s)] (H, W) @ Rx[s]^T (W, P)

    with Ry/Rx folding the sampling grid + bilinear weights + bin averaging
    (`roi_align_pallas._separable_weights`, the same helper the inference
    kernel uses).  The prior per-ROI gather formulation issued ~6.4M
    scattered SINGLE-FLOAT gathers per image (rows of width C=1) and was
    the stage-3 training step's dominant cost (~1.3s/step at ims 8,
    PROFILE.md "Training attribution"); this runs the identical math as
    dense f32 matmuls.  Chunked over ROIs to bound the gathered mask slab.
    """
    from ..ops.roi_align_pallas import _separable_weights

    g_cap, h, w = gt_masks.shape
    s = boxes.shape[0]
    p = mask_size
    # d2 crop_and_resize convention: spatial_scale 1, sampling_ratio 2,
    # aligned (half-pixel) sampling
    ys, xs, y_mask, x_mask = _sample_coords(boxes, 1.0, p, 2, True,
                                            adaptive_cap=2)
    n2 = jnp.full((s,), 2, jnp.int32)
    ry = _separable_weights(ys, y_mask, n2, jnp.full((s,), h, jnp.int32),
                            jnp.zeros((s,), jnp.int32), h)      # (S, P, H)
    rx = _separable_weights(xs, x_mask, n2, jnp.full((s,), w, jnp.int32),
                            jnp.zeros((s,), jnp.int32), w)      # (S, P, W)

    chunk = max(1, min(chunk, s))
    masks_f = gt_masks.astype(jnp.float32)

    def chunk_fn(args):
        ry_c, rx_c, mi_c = args
        m_c = masks_f[mi_c]                                     # (K, H, W)
        t = jnp.einsum("sqh,shw->sqw", ry_c, m_c,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("sqw,spw->sqp", t, rx_c,
                          precision=jax.lax.Precision.HIGHEST)  # (K, P, P)

    pad = (-s) % chunk
    mi = matched_idx
    if pad:
        ry = jnp.pad(ry, ((0, pad), (0, 0), (0, 0)))
        rx = jnp.pad(rx, ((0, pad), (0, 0), (0, 0)))
        mi = jnp.pad(mi, (0, pad))
    resh = lambda a: a.reshape((-1, chunk) + a.shape[1:])
    crops = jax.lax.map(chunk_fn, (resh(ry), resh(rx), resh(mi)))
    crops = crops.reshape(-1, p, p)[:s]
    return (crops >= 0.5).astype(jnp.float32)



def _softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def detection_losses(outputs: Dict, rois: SampledROIs, gt: Dict,
                     cfg: Config) -> Dict[str, jnp.ndarray]:
    """All ROI-head + depth losses given forward_train outputs.

    gt: dict of padded per-image arrays — boxes (B,G,4), classes (B,G),
    valid (B,G), masks (B,G,H,W), planes (B,G,3), rot_axis (B,G,4),
    tran_axis (B,G,4), depth (B,480,640).
    """
    mcfg = cfg.model
    losses: Dict[str, jnp.ndarray] = {}
    b, s = rois.boxes.shape[:2]
    flat = lambda x: x.reshape((b * s,) + x.shape[2:])

    sampled = flat(rois.is_sampled)
    fg = flat(rois.is_fg)
    cls = flat(rois.classes)
    midx = rois.matched_idx  # (B, S)

    def gather_gt(field):
        # (B, G, ...) -> (B, S, ...) via matched_idx
        return jax.vmap(lambda g, i: g[i])(gt[field], midx)

    num_sampled = jnp.maximum(jnp.sum(sampled), 1.0)

    # ---- box head -----------------------------------------------------
    if "roi_heads.box_head" not in mcfg.freeze and "roi_heads.box_predictor" not in mcfg.freeze:
        scores = flat(outputs["box_scores"])
        ce = _softmax_ce(scores, cls)
        losses["loss_cls"] = jnp.sum(jnp.where(sampled, ce, 0.0)) / num_sampled

        deltas = flat(outputs["box_deltas"]).reshape(b * s, -1, 4)
        tgt = encode_deltas(rois.boxes, gather_gt("boxes"),
                            mcfg.box_head.bbox_reg_weights)
        if deltas.shape[1] == 1:
            sel = deltas[:, 0]
        else:
            safe_cls = jnp.clip(cls, 0, mcfg.roi_heads.num_classes - 1)
            sel = jnp.take_along_axis(deltas, safe_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
        reg = smooth_l1_loss(sel, flat(tgt), mcfg.box_head.smooth_l1_beta)
        losses["loss_box_reg"] = jnp.sum(jnp.where(fg[:, None], reg, 0.0)) / num_sampled

    num_fg = jnp.maximum(jnp.sum(fg), 1.0)

    # ---- mask head ----------------------------------------------------
    if "mask_logits" in outputs:
        mlogits = flat(outputs["mask_logits"])          # (BS, M, M, 1|C)
        msize = mlogits.shape[1]
        mtgt = jax.vmap(lambda gm, mi, bx: crop_gt_masks(gm, mi, bx, msize))(
            gt["masks"], midx, rois.boxes)              # (B, S, M, M)
        mtgt = flat(mtgt)
        if mlogits.shape[-1] == 1:
            ml = mlogits[..., 0]
        else:
            safe_cls = jnp.clip(cls, 0, mcfg.roi_heads.num_classes - 1)
            ml = jnp.take_along_axis(
                mlogits, safe_cls[:, None, None, None], axis=-1)[..., 0]
        bce = jnp.maximum(ml, 0) - ml * mtgt + jnp.log1p(jnp.exp(-jnp.abs(ml)))
        per_roi = jnp.mean(bce, axis=(1, 2))
        losses["loss_mask"] = jnp.sum(jnp.where(fg, per_roi, 0.0)) / num_fg

    # ---- plane head ---------------------------------------------------
    if "plane_pred" in outputs:
        pp = flat(outputs["plane_pred"])
        gt_planes = flat(gather_gt("planes"))
        if mcfg.plane_head.normal_only:
            gt_planes = gt_planes / jnp.maximum(
                jnp.linalg.norm(gt_planes, axis=-1, keepdims=True), 1e-12)
        l1 = smooth_l1_loss(pp, gt_planes, 0.0)
        # reference: sum / num_fg (plane_head.py:122-123)
        losses["loss_plane"] = (mcfg.plane_head.loss_weight *
                                jnp.sum(jnp.where(fg[:, None], l1, 0.0)) / num_fg)

    # ---- axis head ------------------------------------------------------
    if "rot_pred" in outputs:
        acfg = mcfg.axis_head
        rot_gt = flat(gather_gt("rot_axis"))        # (BS, 4) sin,cos,off,valid
        tran_gt = flat(gather_gt("tran_axis"))
        rot_pred = flat(outputs["rot_pred"])
        tran_pred = flat(outputs["tran_pred"])

        rvalid = fg & (rot_gt[:, 3] >= 0.5)
        rl = smooth_l1_loss(rot_pred, rot_gt[:, :3], acfg.smooth_l1_beta)
        n_r = jnp.maximum(jnp.sum(rvalid) * 3, 1.0)
        losses["loss_rot_axis"] = (acfg.loss_weight *
                                   jnp.sum(jnp.where(rvalid[:, None], rl, 0.0)) / n_r)

        tvalid = fg & (tran_gt[:, 3] >= 0.5)
        tl = smooth_l1_loss(double_angle(tran_pred), double_angle(tran_gt[:, :2]),
                            acfg.smooth_l1_beta)
        n_t = jnp.maximum(jnp.sum(tvalid) * 2, 1.0)
        losses["loss_tran_axis"] = (acfg.loss_weight *
                                    jnp.sum(jnp.where(tvalid[:, None], tl, 0.0)) / n_t)

    # ---- refine head ----------------------------------------------------
    if "refine" in outputs:
        from ..models.refine_head import refine_loss_single

        r = outputs["refine"]
        per_image = jax.vmap(refine_loss_single)(
            r["logits"], gt["masks"].astype(jnp.float32), gt["valid"],
            r["soft_masks"], r["valid"])
        # the reference SUMS the per-image losses (refine_head.py:242,278)
        losses["refine_loss"] = (mcfg.refine_head.loss_weight *
                                 jnp.sum(per_image))

    # ---- depth ----------------------------------------------------------
    if "depth_pred" in outputs:
        pred = outputs["depth_pred"]
        gtd = gt["depth"]
        mask = (gtd > 1e-4).astype(pred.dtype)
        losses["depth_loss"] = (mcfg.depth_head.loss_weight *
                                jnp.sum(jnp.abs(pred - gtd) * mask)
                                / jnp.maximum(mask.sum(), 1.0))
    return losses
