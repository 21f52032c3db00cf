"""Temporal articulation pipeline: tracker + RANSAC optimizer + kernels."""

from .kernels import (iou_matrix, rotation_sweep, transform_normals,
                      translation_sweep)
from .optimizer import (check_axis, check_monotonic,
                        fit_plane_from_normals, optimize_planes,
                        optimize_planes_3d_trans, optimize_planes_3dc,
                        optimize_planes_average)
from .tracker import track_planes

__all__ = [
    "track_planes", "optimize_planes", "optimize_planes_3dc",
    "optimize_planes_3d_trans", "optimize_planes_average", "check_axis",
    "check_monotonic", "fit_plane_from_normals", "rotation_sweep",
    "translation_sweep", "iou_matrix", "transform_normals",
]
