"""Offline dataset builder on a synthetic CSV fixture
(reference `datasets/generate_arti.py:49-542`)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from generate_arti import ArtiDataset, load_axis_map  # noqa: E402


def _seg(x1, y1, x2, y2):
    return json.dumps([{"label": "axis",
                        "p1": {"x": x1, "y": y1}, "p2": {"x": x2, "y": y2}}])


def _box(label, x1, y1, x2, y2):
    return json.dumps([{"label": label,
                        "p1": {"x": x1, "y": y1}, "p2": {"x": x2, "y": y2}}])


@pytest.fixture
def fixture(tmp_path):
    import csv
    import cv2

    root = tmp_path / "benchmark"
    frames = tmp_path / "frames"
    neg = tmp_path / "frames_neg"
    for d in (root, frames, neg):
        d.mkdir()

    # 11-char youtube ids
    train_id, val_id, test_id = "AAAAAAAAAAA", "BBBBBBBBBBB", "CCCCCCCCCCC"
    (root / "val.txt").write_text(f"{val_id}_001_05\n")
    (root / "test.txt").write_text(f"{test_id}_001_05\n")

    img = np.zeros((480, 640, 3), np.uint8)
    # keyframes for the center tile (region 4 -> frame 45) and tile 0 (frame 5)
    for yt in (train_id, val_id, test_id):
        for fid in (5, 45):
            cv2.imwrite(str(frames / f"{yt}_001_{fid}.png"), img)
    # one negative frame per split
    for yt in (train_id, val_id, test_id):
        cv2.imwrite(str(neg / f"{yt}_009_05.png"), img)

    # bbox csv: center-tile rotation box for train, tile-0 translation for val,
    # a rot-box-with-tran-axis conflict for test (skipped)
    rows = [
        {"original_filename": f"{train_id}_001.png",
         "status": _box("rotation", 0.40, 0.40, 0.60, 0.60)},
        {"original_filename": f"{val_id}_001.png",
         "status": _box("translation", 0.05, 0.05, 0.30, 0.30)},
        {"original_filename": f"{test_id}_001.png",
         "status": _box("rotation", 0.40, 0.40, 0.60, 0.60)},
        {"original_filename": f"{train_id}_002.png", "status": "[]"},  # 9 neg
    ]
    anno_csv = tmp_path / "step3.csv"
    with open(anno_csv, "w", newline="") as f:
        w = csv.DictWriter(f, ["original_filename", "image_url", "status"])
        w.writeheader()
        for r in rows:
            w.writerow({"image_url": "", **r})

    rot_csv = tmp_path / "step4.csv"
    with open(rot_csv, "w", newline="") as f:
        w = csv.DictWriter(f, ["original_filename", "image_url", "status"])
        w.writeheader()
        w.writerow({"original_filename": f"{train_id}_001.png",
                    "image_url": "", "status": _seg(0.5, 0.2, 0.5, 0.8)})
        w.writerow({"original_filename": f"{test_id}_001.png",
                    "image_url": "", "status": _seg(0.5, 0.2, 0.5, 0.8)})
        # degenerate segment -> None
        w.writerow({"original_filename": f"{val_id}_002.png",
                    "image_url": "", "status": _seg(0.5, 0.5, 0.5, 0.5)})

    tran_csv = tmp_path / "step5.csv"
    with open(tran_csv, "w", newline="") as f:
        w = csv.DictWriter(f, ["original_filename", "image_url", "status"])
        w.writeheader()
        w.writerow({"original_filename": f"{val_id}_001.png",
                    "image_url": "", "status": _seg(0.1, 0.1, 0.3, 0.3)})
        w.writerow({"original_filename": f"{test_id}_001.png",
                    "image_url": "", "status": _seg(0.1, 0.1, 0.3, 0.3)})

    return dict(root=str(root), frames=str(frames), neg=str(neg),
                anno=str(anno_csv), rot=str(rot_csv), tran=str(tran_csv),
                ids=(train_id, val_id, test_id))


def test_axis_map_parsing(fixture):
    m = load_axis_map(fixture["rot"])
    train_id, val_id, _ = fixture["ids"]
    assert m[f"{train_id}_001.png"] == [320, 96, 320, 384]
    assert m[f"{val_id}_002.png"] is None  # degenerate


def test_dump_and_sanity(fixture, capsys):
    ds = ArtiDataset(fixture["root"], fixture["frames"], fixture["neg"],
                     fixture["anno"], fixture["rot"], fixture["tran"])
    train_id, val_id, test_id = fixture["ids"]

    out = {p: ds.dump(p) for p in ("train", "val", "test")}

    # train: 1 positive (center tile -> keyframe 45) + 1 negative
    train = out["train"]["data"]
    assert len(train) == 2
    pos = train[0]
    assert pos["file_name"].endswith(f"{train_id}_001_45.png")
    ann = pos["annotations"][0]
    assert ann["category_id"] == 0
    assert ann["rot_axis"] == [320, 96, 320, 384]
    assert ann["tran_axis"] is None
    # center tile: rel (0.40..0.60) -> tile coords ((x-0.33)*3) -> abs
    np.testing.assert_allclose(
        ann["bbox"], [(0.40 - 0.33) * 3 * 640, (0.40 - 0.33) * 3 * 480,
                      (0.60 - 0.33) * 3 * 640, (0.60 - 0.33) * 3 * 480],
        atol=1e-6)
    assert train[1]["annotations"] == []   # negative frame

    # val: tile 0 translation box -> keyframe 5
    val_pos = out["val"]["data"][0]
    assert val_pos["file_name"].endswith(f"{val_id}_001_5.png")
    assert val_pos["annotations"][0]["category_id"] == 1
    assert val_pos["annotations"][0]["tran_axis"] is not None

    # test: the rot box carries a tran axis -> skipped (only the negative left)
    assert all(not dp["annotations"] for dp in out["test"]["data"])

    # info block contract
    assert out["train"]["categories"] == [
        {"id": 0, "name": "arti_rot"}, {"id": 1, "name": "arti_tran"}]
    assert "description" in out["train"]["info"]

    ds.sanity_check(("train", "val", "test"))
    assert "pass sanity check" in capsys.readouterr().out


def test_builder_output_feeds_catalog_and_mapper(fixture):
    """The built JSON must be loadable by the data pipeline end to end."""
    from articulation3d_tpu.config import Config
    from articulation3d_tpu.data.catalog import (DatasetMetadata,
                                                 load_arti_json,
                                                 register_dataset,
                                                 get_dataset_dicts)
    from articulation3d_tpu.data.mapper import PlaneRCNNMapper

    ds = ArtiDataset(fixture["root"], fixture["frames"], fixture["neg"],
                     fixture["anno"], fixture["rot"], fixture["tran"])
    ds.dump("train")
    json_file = os.path.join(fixture["root"], "cached_set_train.json")

    records = load_arti_json(json_file)
    assert len(records) == 2
    meta = DatasetMetadata(
        name="built_train", json_file=json_file, image_root=fixture["frames"],
        evaluator_type="arti", thing_classes=["arti_rot", "arti_tran"],
        thing_colors=[[0, 130, 200], [230, 25, 75]],
        thing_dataset_id_to_contiguous_id={0: 0, 1: 1})
    register_dataset("built_train", lambda: records, meta)
    recs = get_dataset_dicts("built_train")

    cfg = Config()
    mapper = PlaneRCNNMapper(cfg, is_train=True, max_instances=4)
    sample = mapper(recs[0])
    assert sample["images"].shape == (480, 640, 3)
    assert bool(sample["gt_valid"][0])
    assert int(sample["gt_classes"][0]) == 0
    # the rot axis survives the codec: valid bit set
    assert float(sample["gt_rot_axis"][0, 3]) == 1.0
