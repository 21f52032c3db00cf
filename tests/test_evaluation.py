"""Evaluation suite tests: arti APs, recognition, ScanNet plane APs, RLE IoU."""

import json

import numpy as np
import pytest

from articulation3d_tpu.data.catalog import (DatasetMetadata,
                                             register_dataset)
from articulation3d_tpu.evaluation import (ArtiEvaluator, CocoIndex,
                                           ScannetEvaluator,
                                           convert_to_coco_dict,
                                           evaluate_for_arti_axis,
                                           evaluate_for_planes,
                                           evaluate_for_recognition, roc_auc)
from articulation3d_tpu.utils.rle import rle_encode

ARTI_META = DatasetMetadata(
    name="test_arti", json_file="", image_root="", evaluator_type="arti",
    thing_classes=["arti_rot", "arti_tran"],
    thing_colors=[[0, 130, 200], [230, 25, 75]],
    thing_dataset_id_to_contiguous_id={1: 0, 2: 1})


def make_gt_dataset(n_images=4):
    """One rot GT per image, vertical axis at box center."""
    images, annotations = [], []
    for i in range(n_images):
        images.append({"id": f"img{i}", "width": 640, "height": 480,
                       "file_name": f"img{i}.png"})
        annotations.append({
            "id": i + 1, "image_id": f"img{i}", "bbox": [100, 100, 200, 150],
            "area": 200 * 150, "iscrowd": 0, "category_id": 1,
            "rot_axis": [200, 50, 200, 400], "tran_axis": None,
            "normal": [0.0, 0.0, 1.0],
        })
    return CocoIndex({"images": images, "annotations": annotations,
                      "categories": [{"id": 1, "name": "arti_rot"},
                                     {"id": 2, "name": "arti_tran"}]})


def perfect_prediction(image_id):
    """A detection exactly matching the GT box/axis/normal."""
    from articulation3d_tpu.data.axis_codec import axis_to_angle_offset
    center = np.array([[200.0, 175.0]])  # box [100,100,300,250] center
    rot = axis_to_angle_offset(np.array([[200.0, 50, 200, 400]]), center)[0][:3]
    # stored normal such that plane_to_camera -> camera (0, 0, 1):
    # (a, -c, b) = (0, 0, 1) -> stored (0, 1, 0)
    return {
        "image_id": image_id, "file_name": f"{image_id}.png",
        "instances": [{"image_id": image_id, "category_id": 0,
                       "bbox": [100, 100, 200, 150], "score": 0.99}],
        "pred_rot_axis": rot[None],
        "pred_tran_axis": np.array([[0.0, 1.0]]),
        "pred_plane": np.array([[0.0, 1.0, 0.0]]),
    }


def test_arti_ap_perfect_detector():
    ds = make_gt_dataset(4)
    preds = [perfect_prediction(f"img{i}") for i in range(4)]
    metrics = evaluate_for_arti_axis(preds, ds, ARTI_META, filter_iou=0.7)
    assert metrics["bbox - arti_rot"] == pytest.approx(1.0)
    assert metrics["bbox+axis - arti_rot"] == pytest.approx(1.0)
    assert metrics["bbox+normal - arti_rot"] == pytest.approx(1.0)
    assert metrics["bbox+normal+axis - arti_rot"] == pytest.approx(1.0)


def test_arti_ap_wrong_axis_kills_axis_metric():
    ds = make_gt_dataset(4)
    preds = []
    for i in range(4):
        p = perfect_prediction(f"img{i}")
        # horizontal axis (off-center: through-center encodes degenerately
        # by the sign(C)=0 quirk) instead of vertical: EA ~ 0
        from articulation3d_tpu.data.axis_codec import axis_to_angle_offset
        center = np.array([[200.0, 175.0]])
        p["pred_rot_axis"] = axis_to_angle_offset(
            np.array([[50.0, 120, 400, 120]]), center)[0][:3][None]
        preds.append(p)
    metrics = evaluate_for_arti_axis(preds, ds, ARTI_META, filter_iou=0.7)
    assert metrics["bbox - arti_rot"] == pytest.approx(1.0)
    assert metrics["bbox+axis - arti_rot"] == pytest.approx(0.0)


def test_arti_ap_half_recall():
    ds = make_gt_dataset(4)
    preds = [perfect_prediction(f"img{i}") for i in range(2)]  # miss 2 images
    metrics = evaluate_for_arti_axis(preds, ds, ARTI_META, filter_iou=0.7)
    assert metrics["bbox - arti_rot"] == pytest.approx(0.5)


def test_arti_filter_iou_excludes_non_overlapping():
    ds = make_gt_dataset(2)
    p = perfect_prediction("img0")
    p["instances"][0]["bbox"] = [400, 300, 100, 100]  # IoU 0 with GT
    metrics = evaluate_for_arti_axis([p], ds, ARTI_META, filter_iou=0.7)
    # the non-overlapping pred is not even counted as FP
    assert metrics["bbox - arti_rot"] == pytest.approx(0.0)


def test_arti_multi_gt_legacy_quirk_scores_low_iou_preds():
    """Reference quirk (`arti_evaluation.py:434-441`): the IoU pre-filter is
    a torch scalar-bool only valid for single-GT images, so on multi-GT
    images EVERY prediction is scored (low-IoU ones become FPs).  The
    opt-in `legacy_quirks=False` rule pre-filters uniformly."""
    images = [{"id": "m0", "width": 640, "height": 480, "file_name": "m0.png"}]
    annotations = []
    for j, bbox in enumerate([[100, 100, 200, 150], [420, 320, 100, 100]]):
        annotations.append({
            "id": j + 1, "image_id": "m0", "bbox": bbox,
            "area": bbox[2] * bbox[3], "iscrowd": 0, "category_id": 1,
            "rot_axis": [200, 50, 200, 400], "tran_axis": None,
            "normal": [0.0, 0.0, 1.0]})
    ds = CocoIndex({"images": images, "annotations": annotations,
                    "categories": [{"id": 1, "name": "arti_rot"},
                                   {"id": 2, "name": "arti_tran"}]})
    p = perfect_prediction("m0")
    # prepend a higher-scored prediction with ~zero IoU against both GTs
    p["instances"].insert(0, {"image_id": "m0", "category_id": 0,
                              "bbox": [0, 300, 60, 60], "score": 0.999})
    p["pred_rot_axis"] = np.concatenate([p["pred_rot_axis"]] * 2)
    p["pred_tran_axis"] = np.concatenate([p["pred_tran_axis"]] * 2)
    p["pred_plane"] = np.concatenate([p["pred_plane"]] * 2)

    legacy = evaluate_for_arti_axis([p], ds, ARTI_META, filter_iou=0.7)
    uniform = evaluate_for_arti_axis([p], ds, ARTI_META, filter_iou=0.7,
                                     legacy_quirks=False)
    # uniform rule drops the stray pred: 1 TP / 2 GTs -> AP 0.5
    assert uniform["bbox - arti_rot"] == pytest.approx(0.5)
    # legacy scores it as a top-ranked FP -> strictly lower AP
    assert legacy["bbox - arti_rot"] < uniform["bbox - arti_rot"]


def test_arti_single_gt_filter_identical_in_both_modes():
    """With one GT per image the legacy pre-filter and the uniform rule
    coincide (the reference's only well-defined case)."""
    ds = make_gt_dataset(2)
    p = perfect_prediction("img0")
    p["instances"][0]["bbox"] = [400, 300, 100, 100]  # IoU 0 with GT
    for quirks in (True, False):
        m = evaluate_for_arti_axis([p], ds, ARTI_META, filter_iou=0.7,
                                   legacy_quirks=quirks)
        assert m["bbox - arti_rot"] == pytest.approx(0.0)


def test_recognition_auroc():
    ds = make_gt_dataset(2)
    # 2 positive images detected, plus 2 absent-GT images with low scores
    preds = [perfect_prediction("img0"), perfect_prediction("img1"),
             {"image_id": "neg0", "instances": [
                 {"image_id": "neg0", "category_id": 0,
                  "bbox": [0, 0, 10, 10], "score": 0.1}]},
             {"image_id": "neg1", "instances": []}]
    metrics = evaluate_for_recognition(preds, ds, ARTI_META, filter_iou=0.7)
    assert metrics["auroc"] == pytest.approx(1.0)
    assert metrics["accuracy"] == pytest.approx(1.0)


def test_roc_auc_matches_hand_computed():
    labels = np.array([1, 1, 0, 0])
    scores = np.array([0.9, 0.4, 0.6, 0.1])
    # pairs: (0.9>0.6),(0.9>0.1),(0.4<0.6),(0.4>0.1) -> 3/4
    assert roc_auc(labels, scores) == pytest.approx(0.75)
    # ties count half
    assert roc_auc(np.array([1, 0]), np.array([0.5, 0.5])) == pytest.approx(0.5)


# --------------------------------------------------------------------------- #
# scannet planes
# --------------------------------------------------------------------------- #

SCAN_META = DatasetMetadata(
    name="test_scannet", json_file="", image_root="", evaluator_type="mp3d",
    thing_classes=["plane", "plane2"], thing_colors=[[1, 2, 3], [4, 5, 6]],
    thing_dataset_id_to_contiguous_id={1: 0, 2: 1})


def make_scannet_dataset():
    mask = np.zeros((480, 640), np.uint8)
    mask[100:250, 100:300] = 1
    rle = rle_encode(mask)
    images = [{"id": "s0", "width": 640, "height": 480, "file_name": "s0.png"}]
    annotations = [{"id": 1, "image_id": "s0", "bbox": [100, 100, 200, 150],
                    "area": int(mask.sum()), "iscrowd": 0, "category_id": 1,
                    "segmentation": rle, "plane": [0.1, 0.2, 2.0]}]
    return CocoIndex({"images": images, "annotations": annotations,
                      "categories": [{"id": 1, "name": "plane"},
                                     {"id": 2, "name": "plane2"}]}), rle


def test_scannet_plane_ap():
    ds, rle = make_scannet_dataset()
    pred = {
        "image_id": "s0",
        "instances": [{"image_id": "s0", "category_id": 0,
                       "bbox": [100, 100, 200, 150], "score": 0.9,
                       "segmentation": rle}],
        "pred_plane": np.array([[0.1, 0.2, 2.0]]),
    }
    m = evaluate_for_planes([pred], ds, SCAN_META, filter_iou=0.7)
    assert m["box_ap@0.5 - plane"] == pytest.approx(1.0)
    assert m["mask_ap@0.5 - plane"] == pytest.approx(1.0)
    assert m["plane_ap@iou0.5normal30.0offset0.3 - plane"] == pytest.approx(1.0)
    assert m["mean_normal"] == pytest.approx(0.0, abs=1e-3)
    assert m["mean_offset"] == pytest.approx(0.0, abs=1e-5)


def test_scannet_plane_ap_bad_offset():
    ds, rle = make_scannet_dataset()
    pred = {
        "image_id": "s0",
        "instances": [{"image_id": "s0", "category_id": 0,
                       "bbox": [100, 100, 200, 150], "score": 0.9,
                       "segmentation": rle}],
        # same normal, offset off by 1.0 -> plane AP 0, box/mask AP 1
        "pred_plane": np.array([[0.15, 0.3, 3.0]]),
    }
    m = evaluate_for_planes([pred], ds, SCAN_META, filter_iou=0.7)
    assert m["box_ap@0.5 - plane"] == pytest.approx(1.0)
    assert m["plane_ap@iou0.5normal30.0offset0.3 - plane"] == pytest.approx(0.0)


def test_override_depth_reestimates_offset(tmp_path):
    """Depth-based offset override: flat depth plane at z = 3 with camera
    normal (0,0,1) must give stored plane with offset 3."""
    ds_json = {"info": {}, "categories": [{"id": 1, "name": "plane"},
                                          {"id": 2, "name": "plane2"}],
               "data": [{"image_id": "s0", "width": 640, "height": 480,
                         "file_name": "s0.png", "annotations": []}]}
    json_path = tmp_path / "cached_set_test.json"
    json_path.write_text(json.dumps(ds_json))
    meta = DatasetMetadata(
        name="ov_test", json_file=str(json_path), image_root="",
        evaluator_type="mp3d", thing_classes=["plane", "plane2"],
        thing_colors=[[1, 2, 3], [4, 5, 6]],
        thing_dataset_id_to_contiguous_id={1: 0, 2: 1})
    register_dataset("ov_test", lambda: ds_json["data"], meta)

    ev = ScannetEvaluator("ov_test")
    mask = np.zeros((480, 640), np.uint8)
    mask[200:280, 280:360] = 1  # central region, rays ~ (0, 0, 1)
    # stored plane with camera normal (0,0,1): camera (a,-c,b) = (0,0,1)
    # -> stored (0, 1, 0); offset will be re-estimated from depth
    inst = {"instances": [{"segmentation": rle_encode(mask)}],
            "pred_plane": np.array([[0.0, 1.0, 0.0]])}
    depth = np.full((480, 640), 3.0)
    xyz = ev.depth2XYZ(depth)
    out = ev.override_depth(xyz, inst)
    new_plane = np.asarray(out["pred_plane"])[0]
    # z-depth 3.0 -> camera offset ~ 3 (rays are unit-z at the center)
    assert np.linalg.norm(new_plane) == pytest.approx(3.0, rel=0.01)


def test_convert_to_coco_dict_extra_keys():
    records = [{
        "image_id": "x", "width": 640, "height": 480, "file_name": "x.png",
        "annotations": [{
            "bbox": [10, 20, 110, 220], "bbox_mode": 0, "category_id": 0,
            "segmentation": [[10, 20, 110, 20, 110, 220, 10, 220]],
            "plane": [1, 2, 3], "rot_axis": [1, 2, 3, 4], "normal": [0, 0, 1],
        }],
    }]
    coco = convert_to_coco_dict(records, ARTI_META)
    ann = coco["annotations"][0]
    assert ann["bbox"] == [10, 20, 100, 200]         # XYWH
    assert ann["category_id"] == 1                    # contiguous 0 -> dataset 1
    assert ann["area"] == pytest.approx(100 * 200)    # shoelace
    assert ann["plane"] == [1, 2, 3] and ann["rot_axis"] == [1, 2, 3, 4]
    assert coco["categories"][0] == {"id": 1, "name": "arti_rot"}
