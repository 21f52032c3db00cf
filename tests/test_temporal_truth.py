"""End-to-end temporal-optimizer truth test (VERDICT r3 #8).

Synthesizes a 30-frame clip of a KNOWN articulation — a planar door rotating
about a fixed vertical 3D hinge, rendered through the optimizer's own camera
model (f=517.97, principal point at the image center) — and asserts the full
`track_planes` -> `optimize_planes('3dc')` pipeline recovers it:

  * exactly one rotation track spanning all frames;
  * the RANSAC/cluster pass CONFIRMS articulation (`has_rot=True`) — the
    per-frame best-IoU sweep angles follow the ground-truth linear schedule,
    so the r^2 gate (>0.3) passes decisively;
  * every frame's snapped axis matches the ground-truth hinge projection
    with EA > 0.8 (the evaluator's own line-similarity metric);
  * no detection of the articulating track gets score-downweighted.

Unit tests in test_temporal.py cover the pieces (sweeps, IoU kernel, track
pruning, codec); this covers recovery of a known ANSWER.
Reference behavior being matched: `utils/opt_utils.py:382-682,962-974`.
"""

import random

import numpy as np
import pytest

from articulation3d_tpu.data.axis_codec import axis_to_angle_offset
from articulation3d_tpu.structures import FramePrediction
from articulation3d_tpu.temporal import optimize_planes, track_planes
from articulation3d_tpu.temporal.optimizer import _decode_axis
from articulation3d_tpu.utils.camera import FOCAL_OPT, intrinsics
from articulation3d_tpu.utils.coords import camera_to_plane
from articulation3d_tpu.utils.metrics import EA_metric, Line

H, W = 480, 640
N_FRAMES = 30
HINGE_X, HINGE_Z = -0.5, 3.0      # vertical hinge line in camera space
HINGE_Y = (-0.8, 0.8)
DOOR_W = 1.2                       # meters, swings away from the hinge


def _project(pts3d: np.ndarray) -> np.ndarray:
    """(N, 3) camera-space -> (N, 2) pixel (x, y)."""
    k = intrinsics(H, W, FOCAL_OPT)
    uvw = pts3d @ k.T
    return uvw[:, :2] / uvw[:, 2:3]


def _door_frame(theta: float) -> FramePrediction:
    """One frame of the rotating door at hinge angle `theta`."""
    import cv2

    a = np.array([HINGE_X, HINGE_Y[0], HINGE_Z])
    b = np.array([HINGE_X, HINGE_Y[1], HINGE_Z])
    d = np.array([np.cos(theta), 0.0, np.sin(theta)])
    corners = np.stack([a, b, b + DOOR_W * d, a + DOOR_W * d])
    quad = _project(corners)

    mask = np.zeros((H, W), np.uint8)
    cv2.fillPoly(mask, [np.round(quad).astype(np.int32)], 1)
    ys, xs = np.nonzero(mask)
    box = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                   np.float32)

    # camera-space plane of the door: n . p = offset
    n = np.array([-np.sin(theta), 0.0, np.cos(theta)])
    offset = float(n @ a)
    assert offset > 0
    plane_stored = camera_to_plane(n * offset)

    hinge_2d = _project(np.stack([a, b])).reshape(4)
    center = (box[:2] + box[2:]) / 2.0
    enc = axis_to_angle_offset(hinge_2d[None], center[None])[0]

    return FramePrediction(
        boxes=box[None], scores=np.array([0.9]), classes=np.array([0]),
        masks=mask[None].astype(bool), planes=plane_stored[None],
        rot_axis=enc[None, :3], tran_axis=np.zeros((1, 2), np.float32))


@pytest.mark.slow
def test_rotating_door_articulation_recovered():
    thetas = np.linspace(-0.4, 0.4, N_FRAMES)
    preds = [_door_frame(float(t)) for t in thetas]
    gt_seg_xy = _project(np.stack([
        np.array([HINGE_X, HINGE_Y[0], HINGE_Z]),
        np.array([HINGE_X, HINGE_Y[1], HINGE_Z])])).reshape(4)
    gt_line = Line([gt_seg_xy[1], gt_seg_xy[0], gt_seg_xy[3], gt_seg_xy[2]])

    random.seed(2020)  # the reference CLIs' own seed (tools/opt_arti.py)
    tracks = track_planes(preds)
    assert len(tracks["rot"]) == 1 and len(tracks["trans"]) == 0
    assert len(tracks["rot"][0]["ids"]) == N_FRAMES

    opt = optimize_planes(preds, tracks, "3dc", h=H, w=W)

    # the articulation is CONFIRMED, not merely tracked
    assert tracks["rot"][0]["has_rot"] is True
    # no detection of the (conforming) track was downweighted
    for p in opt:
        np.testing.assert_allclose(p.scores, 0.9)

    # the snapped axis matches the ground-truth hinge on EVERY frame
    eas = []
    for p in opt:
        seg = _decode_axis(p, "rot", H, W)[0].astype(np.float64)
        line = Line([seg[1], seg[0], seg[3], seg[2]])
        eas.append(EA_metric(line, gt_line, size=(W, H)))
    eas = np.asarray(eas)
    assert eas.min() > 0.8, eas
