"""Host + jnp utilities: camera model, metrics, RLE masks, VOC AP."""

from .camera import (FOCAL_EVAL, FOCAL_OPT, get_pcd, get_pcd_depth,
                     intrinsics, intrinsics_eval, precompute_K_inv_dot_xy_1,
                     project2D)
from .metrics import (EA_metric, Line, compare_axis, compare_planes,
                      compare_planes_one_to_one, ea_matrix, sa_metric,
                      se_metric)
from .rle import mask_iou, rle_area, rle_decode, rle_encode
from .vocap import compute_ap, xVOCap

__all__ = [
    "FOCAL_OPT", "FOCAL_EVAL", "get_pcd", "get_pcd_depth", "project2D",
    "intrinsics", "intrinsics_eval", "precompute_K_inv_dot_xy_1",
    "Line", "EA_metric", "sa_metric", "se_metric", "ea_matrix",
    "compare_planes", "compare_planes_one_to_one", "compare_axis",
    "rle_encode", "rle_decode", "rle_area", "mask_iou",
    "compute_ap", "xVOCap",
]
