"""Temporal articulation optimization: RANSAC clustering over tracked planes.

Re-implements the reference optimizer (`utils/opt_utils.py:49-974`) with the
hypothesis sweep on-device (see `kernels.py`) and the tiny RANSAC/cluster
bookkeeping host-side:

  * `optimize_planes(preds, planes, '3dc', frames)` = translation pass then
    rotation pass (`opt_utils.py:962-974`);
  * per track, 5 RANSAC rounds: pick a random seed frame (python `random`,
    so external `random.seed(2020)` reproduces the reference tools), lift
    its mask to 3D through its predicted plane, sweep rotations about the
    predicted axis (angles -pi/2..pi step pi/30; translations -1..1 step
    0.1), per-frame best-IoU hypothesis, inliers have IoU > 0.5;
  * cluster score = r^2 of linregress(inlier order, best angles) — clusters
    with < 5 inliers score 0; max r^2 < 0.3 => no articulation
    (`has_rot = False`);
  * winning cluster's center frame provides the canonical axis, re-encoded
    about each frame's box center (rotation) or copied (translation); scores
    of non-conforming detections multiply by 0.6.

Reference quirks preserved deliberately:
  * the inlier loop mutates `id_list` while iterating, so CPython skips the
    element after each removal — reproduced with an index walk;
  * regularized masks/normals are computed but never applied (the reference
    apply-loop `continue`s before using them — `opt_utils.py:649,906`); they
    are stored on the track dict for diagnostics;
  * degenerate axis geometry (nan direction) in the reference crashes into
    pdb; here the seed round yields an empty cluster instead.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.stats import linregress

import jax.numpy as jnp

from ..data.axis_codec import angle_offset_to_axis, axis_to_angle_offset
from ..utils.camera import get_pcd
from ..utils.coords import camera_to_plane, plane_to_camera
from ..utils.metrics import EA_metric, Line
from .kernels import (iou_matrix_bucketed, rotation_sweep, transform_normals,
                      translation_sweep)

SCORE_DOWNWEIGHT = 0.6
INLIER_IOU = 0.5
MIN_CLUSTER = 5
MIN_RSQ = 0.3
NUM_RANSAC = 5


def fit_plane_from_normals(normals: np.ndarray) -> np.ndarray:
    """Largest-variance-orthogonal direction of a normal bundle: smallest
    right singular vector of normals^T normals (`opt_utils.py:49-72`)."""
    normals = np.asarray(normals, np.float64)
    sts = normals.T @ normals
    _, _, vh = np.linalg.svd(sts)
    return vh[2, :]


def _decode_axis(p, kind: str, h: int, w: int) -> np.ndarray:
    """All boxes' axis segments for one frame: (N, 4) int [x1, y1, x2, y2]."""
    centers = p.box_centers
    if kind == "rot":
        params = p.rot_axis
    else:
        params = np.concatenate(
            [p.tran_axis, np.zeros((len(p.tran_axis), 1), np.float32)], axis=1)
    return angle_offset_to_axis(params, centers, H=h, W=w)


def _seed_geometry(p, box_id: int, kind: str, h: int, w: int
                   ) -> Optional[Tuple[np.ndarray, ...]]:
    """(mask, normal, offset, axis_p0, dir_vec) for one seed detection.

    Mirrors `opt_utils.py:400-420`: camera-space plane, decoded axis segment
    lifted to 3D, normalized direction.  Returns None on degenerate geometry.
    """
    plane_cam = plane_to_camera(p.planes[box_id].astype(np.float64))
    offset = np.linalg.norm(plane_cam)
    if offset < 1e-8:
        return None
    normal = plane_cam / offset
    pts = _decode_axis(p, kind, h, w)[box_id].reshape(2, 2).astype(np.float64)
    axis_3d = np.asarray(get_pcd(pts, normal, offset, h=h, w=w))
    dir_vec = axis_3d[1] - axis_3d[0]
    n = np.linalg.norm(dir_vec)
    if not np.isfinite(n) or n < 1e-12 or not np.all(np.isfinite(axis_3d)):
        return None
    dir_vec = dir_vec / n
    mask = np.asarray(p.masks[box_id], np.float32)
    return mask, normal, offset, axis_3d[0], dir_vec


def _sweep(seed, kind: str, hyp: np.ndarray, h: int, w: int) -> np.ndarray:
    """(A, H, W) hypothesis masks for a seed (device kernel)."""
    mask, normal, offset, p0, dir_vec = seed
    if kind == "rot":
        return rotation_sweep(
            jnp.asarray(mask), jnp.asarray(normal, jnp.float32),
            jnp.float32(offset), jnp.asarray(p0, jnp.float32),
            jnp.asarray(dir_vec, jnp.float32), jnp.asarray(hyp, jnp.float32),
            h=h, w=w)
    return translation_sweep(
        jnp.asarray(mask), jnp.asarray(normal, jnp.float32),
        jnp.float32(offset), jnp.asarray(dir_vec, jnp.float32),
        jnp.asarray(hyp, jnp.float32), h=h, w=w)


def _cluster_pass(preds: Sequence, plane: Dict, kind: str, hyp: np.ndarray,
                  h: int, w: int) -> List[Dict]:
    """5 RANSAC rounds over one track -> clusters (`opt_utils.py:390-500`)."""
    id_list = list(plane["ids"].keys())
    clusters: List[Dict] = []
    for _ in range(NUM_RANSAC):
        if len(id_list) == 0:
            break
        select_idx = random.choice(id_list)
        seed = _seed_geometry(preds[select_idx], plane["ids"][select_idx],
                              kind, h, w)
        cluster = {"center_id": select_idx, "inliners": [],
                   "angles": [], "ious": []}
        if seed is not None:
            proj = _sweep(seed, kind, hyp, h, w)
            frame_masks = np.stack(
                [np.asarray(preds[i].masks[plane["ids"][i]]) for i in id_list])
            # bucketed frame axis: F shrinks every round; padding to a
            # power-of-two bucket avoids one XLA compile per distinct F.
            # Fetch the whole matrix in ONE transfer: the per-row reads
            # below would otherwise each pay a device round trip (~F
            # round trips per round on a remote PJRT client).
            ious = np.asarray(iou_matrix_bucketed(frame_masks, proj))
            # CPython for-loop + remove() skips the element after each removal
            pos = {idx: k for k, idx in enumerate(id_list)}
            i = 0
            while i < len(id_list):
                idx = id_list[i]
                row = ious[pos[idx]]
                if np.max(row) > INLIER_IOU:
                    cluster["inliners"].append(idx)
                    cluster["angles"].append(float(hyp[int(np.argmax(row))]))
                    cluster["ious"].append(float(np.max(row)))
                    id_list.remove(idx)
                i += 1
        cluster["angles"] = np.asarray(cluster["angles"], np.float32)
        clusters.append(cluster)
    return clusters


def _cluster_rsqs(clusters: List[Dict]) -> np.ndarray:
    """r^2 of angle-vs-order per cluster (`opt_utils.py:503-516`)."""
    rsqs = []
    for cluster in clusters:
        if len(cluster["inliners"]) < MIN_CLUSTER:
            rsqs.append(0.0)
            continue
        reg = linregress(range(cluster["angles"].shape[0]), cluster["angles"])
        rsqs.append(reg.rvalue ** 2)
    return np.array(rsqs) if rsqs else np.array([0.0])


def _regularize(preds, plane, kind: str, hyp_final: np.ndarray,
                select_idx: int, h: int, w: int) -> None:
    """Winning-cluster sweep -> per-frame regularized masks (+normals for
    rotation).  Stored on the track, never applied (reference dead code,
    `opt_utils.py:600-649`)."""
    seed = _seed_geometry(preds[select_idx], plane["ids"][select_idx], kind, h, w)
    if seed is None:
        return
    proj = np.asarray(_sweep(seed, kind, hyp_final, h, w))
    normals_t = None
    if kind == "rot":
        _, normal, _, _, dir_vec = seed
        normals_t = np.asarray(transform_normals(
            jnp.asarray(normal, jnp.float32),
            jnp.asarray(dir_vec, jnp.float32),
            jnp.asarray(hyp_final, jnp.float32)))
    plane["reg_masks"] = {}
    plane["reg_normals"] = {}
    frame_ids = list(plane["ids"].keys())
    frame_masks = np.stack(
        [np.asarray(preds[i].masks[plane["ids"][i]]) for i in frame_ids])
    ious = np.asarray(iou_matrix_bucketed(frame_masks, jnp.asarray(proj)))
    for k, idx in enumerate(frame_ids):
        aid = int(np.argmax(ious[k]))
        plane["reg_masks"][idx] = proj[aid]
        if normals_t is not None:
            plane["reg_normals"][idx] = camera_to_plane(normals_t[aid])


def _optimize_kind(preds: Sequence, planes: List[Dict], kind: str,
                   h: int, w: int) -> List:
    """Shared body of optimize_planes_3dc / _3d_trans."""
    if kind == "rot":
        hyp_cluster = np.arange(-np.pi / 2, np.pi, np.pi / 30)
        hyp_final = np.arange(-np.pi / 2, np.pi / 2, np.pi / 30)
    else:
        hyp_cluster = np.arange(-1.0, 1.0, 0.1)
        hyp_final = hyp_cluster

    for plane in planes:
        clusters = _cluster_pass(preds, plane, kind, hyp_cluster, h, w)
        rsqs = _cluster_rsqs(clusters)
        if rsqs.max() < MIN_RSQ:
            plane["has_rot"] = False
            continue
        plane["has_rot"] = True
        final_cluster = clusters[int(np.argmax(rsqs))]
        select_idx = final_cluster["center_id"]
        box_id = plane["ids"][select_idx]
        center_pred = preds[select_idx]
        if kind == "rot":
            plane["std_axis"] = _decode_axis(center_pred, "rot", h, w)[box_id]
        else:
            plane["std_axis"] = center_pred.tran_axis[box_id].copy()
        _regularize(preds, plane, kind, hyp_final, select_idx, h, w)

    # apply back (`opt_utils.py:652-682` / `905-959`)
    opt_preds = []
    other_class = 1 if kind == "rot" else 0
    for idx, p in enumerate(preds):
        new_p = p.copy()
        chosen = np.zeros(len(p), bool)
        chosen[p.classes == other_class] = True  # other category untouched
        for plane in planes:
            if idx not in plane["ids"]:
                continue
            box_id = plane["ids"][idx]
            if not plane["has_rot"]:
                chosen[box_id] = False
                continue
            chosen[box_id] = True
            if kind == "rot":
                center = p.box_centers[box_id]
                enc = axis_to_angle_offset(
                    np.asarray(plane["std_axis"], np.float64)[None],
                    center[None])[0]
                new_p.rot_axis[box_id] = enc[:3]
            else:
                new_p.tran_axis[box_id] = plane["std_axis"]
        new_p.scores = np.where(chosen, new_p.scores,
                                new_p.scores * SCORE_DOWNWEIGHT)
        opt_preds.append(new_p)
    return opt_preds


def optimize_planes_3dc(preds: Sequence, planes: List[Dict],
                        frames=None, h: int = 480, w: int = 640) -> List:
    """Rotation pass (`opt_utils.py:382-682`)."""
    return _optimize_kind(preds, planes, "rot", h, w)


def optimize_planes_3d_trans(preds: Sequence, planes: List[Dict],
                             frames=None, h: int = 480, w: int = 640) -> List:
    """Translation pass (`opt_utils.py:685-959`)."""
    return _optimize_kind(preds, planes, "trans", h, w)


def optimize_planes_average(preds: Sequence, planes: List[Dict]) -> List:
    """Mean-axis baseline (`opt_utils.py:77-110`): re-encode each frame's
    rot axis about the image center (320, 240), average over the track,
    write the mean back to every track frame."""
    h, w = 480, 640
    for plane in planes:
        std_axes = []
        img_center = np.array([[320.0, 240.0]])
        for idx, box_id in plane["ids"].items():
            p = preds[idx]
            pts = _decode_axis(p, "rot", h, w)
            std = axis_to_angle_offset(pts.astype(np.float64),
                                       np.repeat(img_center, len(pts), axis=0))
            std_axes.append(std[box_id, :3])
        plane["std_axis"] = np.mean(np.stack(std_axes), axis=0)

    opt_preds = []
    for idx, p in enumerate(preds):
        new_p = p.copy()
        for plane in planes:
            if idx in plane["ids"]:
                new_p.rot_axis[plane["ids"][idx]] = plane["std_axis"]
        opt_preds.append(new_p)
    return opt_preds


def optimize_planes(preds: Sequence, planes, method: str, frames=None,
                    h: int = 480, w: int = 640) -> List:
    """Dispatcher (`opt_utils.py:962-974`): '3dc' runs the translation pass
    first, then the rotation pass on its output."""
    if method == "average":
        return optimize_planes_average(preds, planes)
    if method == "3dc":
        opt = optimize_planes_3d_trans(preds, planes["trans"], frames=frames,
                                       h=h, w=w)
        return optimize_planes_3dc(opt, planes["rot"], frames=frames, h=h, w=w)
    raise NotImplementedError(method)


# --------------------------------------------------------------------------- #
# diagnostics (`opt_utils.py:977-1065`)
# --------------------------------------------------------------------------- #

def _axis_consistency(segments: np.ndarray) -> List[float]:
    """Pairwise EA of decoded axis segments ((x1,y1,x2,y2) rows -> Line takes
    [y, x] pairs, reference `check_axis:1012-1031`)."""
    scores = []
    n = segments.shape[0]
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            try:
                pi, pj = segments[i], segments[j]
                line_i = Line([pi[1], pi[0], pi[3], pi[2]])
                line_j = Line([pj[1], pj[0], pj[3], pj[2]])
                scores.append(EA_metric(line_i, line_j))
            except Exception:
                scores.append(0.0)
    return scores


def check_monotonic(preds: Sequence, opt_preds: Sequence, planes: List[Dict],
                    method: str = "", frames=None
                    ) -> Tuple[List[List[float]], List[List[float]]]:
    """Normal-bundle planarity diagnostic (reference `check_monotonic`,
    `utils/opt_utils.py:1068-1152`).

    Per track: collect each frame's predicted plane normal (converted to
    camera convention), SVD-fit the plane of normals
    (`fit_plane_from_normals`), and score the fit as mean |n . plane_n| —
    for both the raw and the optimized predictions.  Returns
    (fit_scores, opt_fit_scores) as lists of 1-element lists, matching the
    reference's return shape (the spearman-rank path is dead code there and
    is not ported).
    """
    def track_fit(pred_list, plane) -> float:
        normals = []
        for idx in plane["ids"]:
            box_id = plane["ids"][idx]
            p = pred_list[idx]
            cam = plane_to_camera(p.planes[box_id:box_id + 1])
            n = cam / np.maximum(np.linalg.norm(cam, axis=1, keepdims=True),
                                 1e-12)
            normals.append(n)
        normals = np.concatenate(normals, axis=0)
        plane_n = fit_plane_from_normals(normals)
        return float(np.abs(normals @ plane_n).mean())

    corrs = [[track_fit(preds, pl)] for pl in planes]
    opt_corrs = [[track_fit(opt_preds, pl)] for pl in planes]
    return corrs, opt_corrs


def check_axis(preds: Sequence, opt_preds: Sequence, planes: List[Dict],
               method: str = "", frames=None, h: int = 480, w: int = 640
               ) -> Tuple[List[float], List[float]]:
    """Pre/post-optimization axis EA-consistency (reference `check_axis`).
    Tracks whose mean score dropped >= 0.1 are excluded (same gate)."""
    scores_all: List[float] = []
    opt_scores_all: List[float] = []
    for plane in planes:
        id_list = list(plane["ids"].keys())

        def collect(pred_list):
            segs, box_scores = [], []
            for idx in id_list:
                box_id = plane["ids"][idx]
                p = pred_list[idx]
                segs.append(_decode_axis(p, "rot", h, w)[box_id])
                box_scores.append(p.scores[box_id])
            return np.stack(segs), np.asarray(box_scores)

        segs, box_scores = collect(preds)
        opt_segs, opt_box_scores = collect(opt_preds)
        scores = _axis_consistency(segs)
        opt_scores = _axis_consistency(opt_segs)
        if box_scores.mean() - opt_box_scores.mean() < 0.1:
            scores_all.extend(scores)
            opt_scores_all.extend(opt_scores)
    return scores_all, opt_scores_all
