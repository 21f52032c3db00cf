"""Evaluation suite: articulation APs, ScanNet plane APs, COCO conversion."""

from .arti_evaluation import (ArtiEvaluator, evaluate_for_arti_axis,
                              evaluate_for_recognition, roc_auc)
from .coco_index import CocoIndex
from .detectron2coco import convert_to_coco_dict
from .scannet_evaluation import (ScannetEvaluator, evaluate_for_planes,
                                 get_depth_err)

__all__ = [
    "ArtiEvaluator", "ScannetEvaluator", "CocoIndex", "convert_to_coco_dict",
    "evaluate_for_arti_axis", "evaluate_for_recognition", "roc_auc",
    "evaluate_for_planes", "get_depth_err",
]
