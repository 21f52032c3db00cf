"""Offline dataset builder: CSV annotation exports -> cached_set_*.json.

Re-implements the reference `datasets/generate_arti.py:49-542` with the same
contract but parameterized paths (the reference hardcodes lab directories):

  * rot/tran axis CSVs (`step4_rot.csv` / `step5_trans.csv`): one row per
    keyframe image, `status` column holds a JSON list whose first element is
    a line segment {p1: {x, y}, p2: {x, y}} in relative coords; scaled to
    absolute 640x480, degenerate (coincident-endpoint) segments dropped to
    None (`generate_arti.py:205-275`);
  * bbox CSV (`step3_anno.csv`): `status` holds a list of labeled boxes in
    relative coords over a 3x3 frame-tiling contact sheet; each box is
    assigned to the tile that loosely contains it (loose regions overlap by
    0.03), mapped to keyframe ids [5, 15, ..., 85], and rescaled from tile
    coords to absolute 640x480 (`generate_arti.py:322-423`);
  * label/axis consistency: a rotation box with a translation axis (or vice
    versa) is skipped with a warning (`generate_arti.py:386-401`);
  * negative frames: PNGs from a separate directory, phase-filtered, with
    empty annotations (`generate_arti.py:163-190`);
  * splits: YouTube-id (first 11 chars of the clip name) disjoint train /
    val / test from `val.txt` / `test.txt` (`generate_arti.py:79-93`);
  * `info` block with description / date / (optional) git hash and
    categories [{id: 0, arti_rot}, {id: 1, arti_tran}]
    (`generate_arti.py:440-462`);
  * `sanity_check` asserts split disjointness and prints per-phase stats
    (`generate_arti.py:95-144`).

Usage:
  python tools/generate_arti.py --root benchmark \
      --frame-dir frames_v1 --neg-frame-dir frames_v1_neg \
      --anno-csv step3_anno.csv --rot-csv step4_rot.csv \
      --tran-csv step5_trans.csv [--phases train val test] \
      [--overfit-ids ID1 ID2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

KEYFRAME_IDS = [5, 15, 25, 35, 45, 55, 65, 75, 85]

# 3x3 contact-sheet tiling: [xmin, xmax, ymin, ymax] per tile.  `LOOSE`
# overlaps by 0.03/0.02 for boxes that spill slightly over tile borders
# (`generate_arti.py:325-346`).
LOOSE_REGIONS = [
    [0.00, 0.35, 0.00, 0.35], [0.32, 0.68, 0.00, 0.35], [0.64, 1.00, 0.00, 0.35],
    [0.00, 0.35, 0.32, 0.68], [0.32, 0.68, 0.32, 0.68], [0.64, 1.00, 0.32, 0.68],
    [0.00, 0.35, 0.64, 1.00], [0.32, 0.68, 0.64, 1.00], [0.64, 1.00, 0.64, 1.00],
]
REGIONS = [
    [0.00, 0.33, 0.00, 0.33], [0.33, 0.66, 0.00, 0.33], [0.66, 1.00, 0.00, 0.33],
    [0.00, 0.33, 0.33, 0.66], [0.33, 0.66, 0.33, 0.66], [0.66, 1.00, 0.33, 0.66],
    [0.00, 0.33, 0.66, 1.00], [0.33, 0.66, 0.66, 1.00], [0.66, 1.00, 0.66, 1.00],
]


def _read_image_size(path: str) -> Optional[tuple]:
    try:
        import cv2
        img = cv2.imread(path)
        return img.shape[:2]
    except Exception:
        return None


def _row_image_name(row: dict) -> Optional[str]:
    """original_filename, falling back to the basename of image_url
    (`generate_arti.py:289-293`)."""
    name = row.get("original_filename")
    if isinstance(name, str) and name:
        return name
    url = row.get("image_url")
    if isinstance(url, str) and url:
        return url.split("/")[-1]
    return None


def _row_status(row: dict):
    """Parse the `status` JSON column; None for empty/NaN rows."""
    status = row.get("status")
    if not isinstance(status, str) or not status.strip():
        return None
    try:
        return json.loads(status)
    except json.JSONDecodeError:
        return None


def _read_csv(path: str) -> List[dict]:
    import csv

    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def load_axis_map(csv_path: str, width: int = 640,
                  height: int = 480) -> Dict[str, Optional[list]]:
    """Keyframe image name -> [x1, y1, x2, y2] absolute axis segment (or
    None for degenerate), reference `generate_arti.py:205-275`."""
    axis_map: Dict[str, Optional[list]] = {}
    for row in _read_csv(csv_path):
        img_name = _row_image_name(row)
        if img_name is None:
            continue
        anno = _row_status(row)
        if not anno or isinstance(anno[0], str):
            continue
        seg = anno[0]
        p1 = (int(seg["p1"]["x"] * width), int(seg["p1"]["y"] * height))
        p2 = (int(seg["p2"]["x"] * width), int(seg["p2"]["y"] * height))
        if p1 == p2:
            print(f"Line segment ends coincide {img_name}")
            axis_map[img_name] = None
        else:
            axis_map[img_name] = [p1[0], p1[1], p2[0], p2[1]]
    return axis_map


class ArtiDataset:
    """The builder (reference `Arti_Dataset`, generate_arti.py:64-482)."""

    def __init__(self, root: str, frame_dir: str, neg_frame_dir: str,
                 anno_csv: str, rot_csv: str, tran_csv: str,
                 overfit_ids: Optional[Sequence[str]] = None,
                 check_images: bool = True):
        self.root = root
        self.frame_dir = frame_dir
        self.neg_frame_dir = neg_frame_dir
        self.anno_csv = anno_csv
        self.rot_csv = rot_csv
        self.tran_csv = tran_csv
        self.check_images = check_images

        self.is_overfit = overfit_ids is not None
        self.overfit_ids = set(overfit_ids or [])
        if self.is_overfit:
            self.test_youtube_ids = self.overfit_ids
            self.val_youtube_ids = self.overfit_ids
            return
        with open(os.path.join(root, "test.txt")) as f:
            self.test_youtube_ids = {s[:11] for s in f.read().splitlines() if s}
        with open(os.path.join(root, "val.txt")) as f:
            self.val_youtube_ids = {s[:11] for s in f.read().splitlines() if s}

    # -- split assignment ---------------------------------------------------
    def get_phase(self, img_name: str) -> str:
        youtube_id = os.path.basename(img_name).split(".")[0][:11]
        if youtube_id in self.test_youtube_ids:
            return "test"
        if youtube_id in self.val_youtube_ids:
            return "val"
        return "train"

    # -- negative frames ----------------------------------------------------
    def collect_negative(self, phase: str, start_idx: int = 0) -> List[dict]:
        idx = start_idx
        out = []
        for filename in sorted(glob(os.path.join(self.neg_frame_dir, "*.png"))):
            if self.get_phase(filename) != phase:
                continue
            if self.check_images and _read_image_size(filename) is None:
                print(f"error {filename}")
                continue
            out.append({
                "file_name": filename,
                "image_id": idx,
                "height": 480,
                "width": 640,
                "annotations": [],
            })
            idx += 1
        return out

    # -- main build ----------------------------------------------------------
    def dump(self, phase: str) -> dict:
        rot_map = load_axis_map(self.rot_csv)
        tran_map = load_axis_map(self.tran_csv)

        dataset_dicts: List[dict] = []
        idx = 0
        neg_count = 0
        for row in _read_csv(self.anno_csv):
            img_name = _row_image_name(row)
            if img_name is None:
                continue
            if self.is_overfit:
                yt = os.path.basename(img_name).split(".")[0][:11]
                if yt not in self.overfit_ids:
                    continue
            elif self.get_phase(img_name) != phase:
                continue
            anno = _row_status(row)
            if anno is None:
                continue
            if len(anno) < 1:
                neg_count += 9
                continue
            neg_count += 9 - len(anno)
            if isinstance(anno[0], str):
                continue

            for bbox in anno:
                label = bbox["label"]
                xmin, ymin = bbox["p1"]["x"], bbox["p1"]["y"]
                xmax, ymax = bbox["p2"]["x"], bbox["p2"]["y"]
                for region_id, region in enumerate(REGIONS):
                    frame_id = KEYFRAME_IDS[region_id]
                    r_xmin, r_xmax, r_ymin, r_ymax = LOOSE_REGIONS[region_id]
                    b_xmin, b_xmax, b_ymin, b_ymax = region
                    if not (xmin >= r_xmin and xmax <= r_xmax
                            and ymin >= r_ymin and ymax <= r_ymax):
                        continue
                    img_path = os.path.join(
                        self.frame_dir,
                        img_name.replace(".png", f"_{frame_id}.png"))
                    if self.check_images and _read_image_size(img_path) is None:
                        print(f"error {img_path}")
                        continue

                    # tile-relative -> frame-relative (x3) -> absolute 640x480
                    bl = [(xmin - b_xmin) * 3, (ymin - b_ymin) * 3,
                          (xmax - b_xmin) * 3, (ymax - b_ymin) * 3]
                    x1 = min(max(bl[0], 0.0), 1.0) * 640
                    y1 = min(max(bl[1], 0.0), 1.0) * 480
                    x2 = min(max(bl[2], 0.0), 1.0) * 640
                    y2 = min(max(bl[3], 0.0), 1.0) * 480

                    rot_axis = rot_map.get(img_name)
                    tran_axis = tran_map.get(img_name)
                    if label == "rotation":
                        category_id = 0
                        if tran_axis is not None:
                            print(f"{img_name} rot bbox has trans_axis")
                            continue
                    elif label == "translation":
                        category_id = 1
                        if rot_axis is not None:
                            print(f"{img_name} trans bbox has rot_axis")
                            continue
                    else:
                        print(f"Annotation Error {img_name}")
                        continue

                    dataset_dicts.append({
                        "file_name": img_path,
                        "image_id": idx,
                        "height": 480,
                        "width": 640,
                        "annotations": [{
                            "bbox": [x1, y1, x2, y2],
                            "bbox_mode": 0,      # XYXY_ABS
                            "category_id": category_id,
                            "rot_axis": rot_axis,
                            "tran_axis": tran_axis,
                        }],
                    })
                    idx += 1
                    break  # box assigned to its first containing tile

        print(f"Positive: {len(dataset_dicts)}")
        print(f"# neg in pos: {neg_count}")
        negatives = self.collect_negative(phase, start_idx=idx)
        print(f"Negative: {len(negatives)}")
        dataset_dicts.extend(negatives)
        print(f"{phase}: {len(dataset_dicts)}")

        summary = self.assign_info(phase, dataset_dicts)
        json_file = os.path.join(self.root, f"cached_set_{phase}.json")
        with open(json_file, "w") as f:
            print(f"Dumping to file {json_file}...")
            json.dump(summary, f)
        return summary

    def assign_info(self, phase: str, dataset_dicts: List[dict]) -> dict:
        description = (
            f"Arti {phase} Dataset, assume image size is 640*480, axis and "
            f"box are in absolute value. Both rotation and translation are "
            f"annotated.")
        try:
            import subprocess
            git_hexsha = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip() or "unknown"
        except Exception:
            git_hexsha = "unknown"
        return {
            "info": {
                "description": description,
                "git_hexsha": git_hexsha,
                "date_created": datetime.now().strftime("%d/%m/%Y %H:%M:%S"),
            },
            "categories": [
                {"id": 0, "name": "arti_rot"},
                {"id": 1, "name": "arti_tran"},
            ],
            "data": dataset_dicts,
        }

    # -- integrity -----------------------------------------------------------
    def sanity_check(self, phases=("val", "test", "train")) -> None:
        """Split-disjointness asserts + per-phase stats
        (`generate_arti.py:95-144`)."""
        youtube_ids = {}
        for phase in phases:
            json_file = os.path.join(self.root, f"cached_set_{phase}.json")
            with open(json_file) as f:
                dataset = json.load(f)["data"]
            youtube_ids[phase] = {
                os.path.basename(dp["file_name"])[:11] for dp in dataset}
            pos = [dp for dp in dataset if dp["annotations"]]
            neg = [dp for dp in dataset if not dp["annotations"]]
            rot = sum(1 for dp in pos
                      if dp["annotations"][0]["rot_axis"] is not None)
            tran = sum(1 for dp in pos
                       if dp["annotations"][0]["tran_axis"] is not None)
            print(f"{phase} statistics: Positive {len(pos)}, "
                  f"Negative {len(neg)}, Tran Axis {tran}, Rot Axis {rot}, "
                  f"Total {len(dataset)}")
        assert not youtube_ids["val"] & youtube_ids["train"]
        assert not youtube_ids["train"] & youtube_ids["test"]
        assert not youtube_ids["test"] & youtube_ids["val"]
        print("pass sanity check")


def save_frames(video_path: str, output_dir: str,
                frame_ids: Sequence[int] = tuple(KEYFRAME_IDS)) -> List[str]:
    """Extract the 9 keyframes from a clip (`generate_arti.py:49-61`)."""
    import imageio

    os.makedirs(output_dir, exist_ok=True)
    video_name = os.path.basename(video_path)
    written = []
    reader = imageio.get_reader(video_path)
    for frame_id, frame in enumerate(reader):
        if frame_id in frame_ids:
            frame_name = video_name.replace(".mp4", f"_{frame_id}.png")
            out = os.path.join(output_dir, frame_name)
            if not os.path.exists(out):
                imageio.imwrite(out, frame)
            written.append(out)
    return written


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True,
                    help="split files (val.txt/test.txt) + output dir")
    ap.add_argument("--frame-dir", required=True)
    ap.add_argument("--neg-frame-dir", required=True)
    ap.add_argument("--anno-csv", required=True)
    ap.add_argument("--rot-csv", required=True)
    ap.add_argument("--tran-csv", required=True)
    ap.add_argument("--phases", nargs="+", default=["val", "test", "train"])
    ap.add_argument("--overfit-ids", nargs="*", default=None,
                    help="build a small overfit subset of these youtube ids")
    ap.add_argument("--no-image-check", action="store_true",
                    help="skip per-record cv2.imread existence checks")
    args = ap.parse_args()

    ds = ArtiDataset(args.root, args.frame_dir, args.neg_frame_dir,
                     args.anno_csv, args.rot_csv, args.tran_csv,
                     overfit_ids=args.overfit_ids,
                     check_images=not args.no_image_check)
    for phase in args.phases:
        ds.dump(phase)
    ds.sanity_check(tuple(args.phases))


if __name__ == "__main__":
    main()
