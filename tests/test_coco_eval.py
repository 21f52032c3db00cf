"""Native COCO mAP protocol + check_monotonic diagnostics."""

import numpy as np
import pytest

from articulation3d_tpu.evaluation.coco_eval import (CocoAPEvaluator,
                                                     evaluate_coco_map)
from articulation3d_tpu.evaluation.coco_index import CocoIndex
from articulation3d_tpu.utils.rle import rle_encode


def _gt(anns, n_imgs=2, h=100, w=100):
    return CocoIndex({
        "images": [{"id": i, "height": h, "width": w,
                    "file_name": f"{i}.png"} for i in range(n_imgs)],
        "annotations": [dict(a, id=i + 1, iscrowd=0,
                             area=a["bbox"][2] * a["bbox"][3])
                        for i, a in enumerate(anns)],
        "categories": [{"id": 1, "name": "arti_rot"},
                       {"id": 2, "name": "arti_tran"}],
    })


def test_perfect_detections_ap100():
    gt = _gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]},
        {"image_id": 1, "category_id": 2, "bbox": [20, 20, 50, 30]},
    ])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [20, 20, 50, 30], "score": 0.8},
    ]
    res = CocoAPEvaluator(gt, "bbox").evaluate(dets)
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP-arti_rot"] == pytest.approx(100.0)


def test_fp_halves_ap_with_known_value():
    """2 GT, 1 TP at rank 1 + 1 FP at rank 2: 101-pt AP50 = 51/101."""
    gt = _gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40]},
    ])
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [60, 60, 30, 30], "score": 0.8},
    ]
    res = CocoAPEvaluator(gt, "bbox").evaluate(dets)
    assert res["AP50"] == pytest.approx(100 * 51 / 101, abs=1e-6)


def test_localization_quality_splits_thresholds():
    """A det with IoU ~0.6 counts at t=0.5/0.55/0.6 but not above."""
    gt = _gt([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 10]}],
             h=20, w=120)
    # overlap 75/100... choose shifted box: [25,0,100,10] -> inter 75,
    # union 125 -> IoU 0.6
    dets = [{"image_id": 0, "category_id": 1, "bbox": [25, 0, 100, 10],
             "score": 0.9}]
    res = CocoAPEvaluator(gt, "bbox").evaluate(dets)
    # TP at thresholds {.5, .55, .6} of 10 -> AP = 3/10 * 100
    assert res["AP"] == pytest.approx(30.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP75"] == pytest.approx(0.0)


def test_segm_task_with_rle_and_polygons():
    h = w = 60
    gt_mask = np.zeros((h, w), np.uint8)
    gt_mask[10:30, 10:30] = 1
    # polygon gt (square), rle detection
    gt = CocoIndex({
        "images": [{"id": 0, "height": h, "width": w, "file_name": "0.png"}],
        "annotations": [{
            "id": 1, "image_id": 0, "category_id": 1, "iscrowd": 0,
            "bbox": [10, 10, 20, 20], "area": 400,
            "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]],
        }],
        "categories": [{"id": 1, "name": "arti_rot"}],
    })
    det_mask = np.zeros((h, w), np.uint8)
    det_mask[10:30, 10:30] = 1
    preds = [{
        "image_id": 0,
        "instances": [{"image_id": 0, "category_id": 1,
                       "bbox": [10, 10, 20, 20], "score": 0.95,
                       "segmentation": rle_encode(det_mask)}],
    }]
    out = evaluate_coco_map(preds, gt, tasks=("bbox", "segm"))
    assert out["bbox/AP50"] == pytest.approx(100.0)
    assert out["segm/AP50"] == pytest.approx(100.0)


def test_evaluate_coco_map_skips_segm_without_masks():
    gt = _gt([{"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]}])
    preds = [{"image_id": 0, "instances": [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.9}]}]
    out = evaluate_coco_map(preds, gt)
    assert "bbox/AP" in out and not any(k.startswith("segm") for k in out)


def test_check_monotonic_planar_vs_random():
    from articulation3d_tpu.structures import FramePrediction
    from articulation3d_tpu.temporal.optimizer import check_monotonic
    from articulation3d_tpu.utils.coords import camera_to_plane

    rs = np.random.RandomState(0)
    n = 8

    def frame(cam_normal):
        stored = camera_to_plane(cam_normal[None])
        return FramePrediction(
            boxes=np.asarray([[10, 10, 50, 50]]), scores=np.asarray([0.9]),
            classes=np.asarray([0]), masks=np.zeros((1, 4, 4), bool),
            planes=stored, rot_axis=np.asarray([[0.6, 0.8, 0.0]]),
            tran_axis=np.asarray([[0.6, 0.8]]))

    # normals rotating in the xy-plane: plane-of-normals fit ~0 (planar)
    planar = [frame(np.asarray([np.cos(t), np.sin(t), 0.0], np.float32))
              for t in np.linspace(0, 1.2, n)]
    # random normals: poor fit
    rand = [frame(r / np.linalg.norm(r))
            for r in rs.randn(n, 3).astype(np.float32)]
    track = [{"ids": {i: 0 for i in range(n)}, "category_id": 0}]

    corrs, opt_corrs = check_monotonic(planar, rand, track)
    assert corrs[0][0] < 1e-5, "coplanar normals must fit their plane"
    assert opt_corrs[0][0] > 0.05, "random normals must not"
