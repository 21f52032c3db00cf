"""Build a synthetic PRODUCTION-DIMS arti dataset for the on-chip soak run.

VERDICT r4 next #3: the real `Trainer` orchestration loop (loader ->
eval_period -> ArtiEvaluator -> orbax checkpoint -> resume) had only ever
run at CPU tiny shapes; the soak drives it on the TPU at full 480x640
through `tools/train_net.py`.  This tool synthesizes the dataset the soak
trains on, through the SAME offline builder the reference uses
(`tools/generate_arti.py`, reference `datasets/generate_arti.py:49-542`):
CSV annotation exports + extracted frames -> `cached_set_{phase}.json`,
written to the builtin catalog layout (`datasets/articulation/*.json`,
frames under `datasets/arti/`) so `arti_train`/`arti_val` resolve with no
config changes.

Each annotated frame draws a bright textured rectangle exactly at its GT
box over structured noise, so the detector has real signal to overfit.

Usage:  python tools/make_soak_dataset.py [--root datasets] [--train-ids 8]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import string
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))


def _seg(x1, y1, x2, y2):
    return json.dumps([{"label": "axis",
                        "p1": {"x": x1, "y": y1}, "p2": {"x": x2, "y": y2}}])


def _box(label, x1, y1, x2, y2):
    return json.dumps([{"label": label,
                        "p1": {"x": x1, "y": y1}, "p2": {"x": x2, "y": y2}}])


def main():
    import cv2

    from generate_arti import REGIONS, KEYFRAME_IDS, ArtiDataset

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=os.path.join(_ROOT, "datasets"))
    ap.add_argument("--train-ids", type=int, default=8)
    ap.add_argument("--val-ids", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    anno_root = os.path.join(args.root, "articulation")
    frame_dir = os.path.abspath(os.path.join(args.root, "arti"))
    neg_dir = os.path.abspath(os.path.join(args.root, "arti_neg"))
    for d in (anno_root, frame_dir, neg_dir):
        os.makedirs(d, exist_ok=True)

    def yt_id(i):  # 11-char YouTube-style ids, disjoint per index
        a = string.ascii_uppercase
        return (a[i % 26] * 6 + f"{i:05d}")[:11]

    train_ids = [yt_id(i) for i in range(args.train_ids)]
    val_ids = [yt_id(100 + i) for i in range(args.val_ids)]
    test_ids = [yt_id(200)]
    with open(os.path.join(anno_root, "val.txt"), "w") as f:
        f.writelines(f"{v}_001_05\n" for v in val_ids)
    with open(os.path.join(anno_root, "test.txt"), "w") as f:
        f.writelines(f"{t}_001_05\n" for t in test_ids)

    rs = np.random.RandomState(args.seed)
    anno_rows, rot_rows, tran_rows = [], [], []

    def add_video(yt, kind, region_id):
        """One shot: a box inside tile `region_id`, its keyframe drawn."""
        rx0, rx1, ry0, ry1 = REGIONS[region_id]
        # tile-relative box with per-video size/offset jitter
        bw = rs.uniform(0.10, 0.22)
        bh = rs.uniform(0.10, 0.22)
        x1 = rx0 + rs.uniform(0.02, 0.30 - bw)
        y1 = ry0 + rs.uniform(0.02, 0.30 - bh)
        anno_rows.append({"original_filename": f"{yt}_001.png",
                          "image_url": "",
                          "status": _box(kind, x1, y1, x1 + bw, y1 + bh)})
        cx, cy = x1 + bw / 2, y1 + bh / 2
        seg = _seg(cx, y1, cx, y1 + bh)   # vertical axis through the box
        (rot_rows if kind == "rotation" else tran_rows).append(
            {"original_filename": f"{yt}_001.png", "image_url": "",
             "status": seg})

        # frame-absolute pixels (x3 tile scaling, generate_arti.py:228-233)
        fx1 = int(min(max((x1 - rx0) * 3, 0), 1) * 640)
        fy1 = int(min(max((y1 - ry0) * 3, 0), 1) * 480)
        fx2 = int(min(max((x1 + bw - rx0) * 3, 0), 1) * 640)
        fy2 = int(min(max((y1 + bh - ry0) * 3, 0), 1) * 480)
        img = rs.randint(0, 90, (480, 640, 3), np.uint8)
        # structured background texture
        yy = (np.arange(480)[:, None] // 16 % 2) * 25
        img = np.clip(img + yy[..., None], 0, 255).astype(np.uint8)
        color = (int(rs.randint(180, 255)), int(rs.randint(180, 255)),
                 int(rs.randint(180, 255)))
        cv2.rectangle(img, (fx1, fy1), (fx2, fy2), color, -1)
        cv2.line(img, ((fx1 + fx2) // 2, fy1), ((fx1 + fx2) // 2, fy2),
                 (30, 30, 30), 3)
        fid = KEYFRAME_IDS[region_id]
        cv2.imwrite(os.path.join(frame_dir, f"{yt}_001_{fid}.png"), img)

    for i, yt in enumerate(train_ids + val_ids + test_ids):
        kind = "rotation" if i % 2 == 0 else "translation"
        add_video(yt, kind, region_id=(i * 3 + 1) % 9)
        # one negative frame per video
        cv2.imwrite(os.path.join(neg_dir, f"{yt}_009_05.png"),
                    rs.randint(0, 90, (480, 640, 3), np.uint8))

    fields = ["original_filename", "image_url", "status"]
    paths = {}
    for name, rows in (("step3", anno_rows), ("step4", rot_rows),
                       ("step5", tran_rows)):
        p = os.path.join(anno_root, f"{name}.csv")
        with open(p, "w", newline="") as f:
            w = csv.DictWriter(f, fields)
            w.writeheader()
            for r in rows:
                w.writerow(r)
        paths[name] = p

    ds = ArtiDataset(anno_root, frame_dir, neg_dir, paths["step3"],
                     paths["step4"], paths["step5"])
    for phase in ("train", "val", "test"):
        ds.dump(phase)
    ds.sanity_check()

    # -- stage-2/3 targets: the synthetic CSVs carry no mask/depth/plane
    # data, so the builder's cached_set has boxes+axes only (enough for the
    # stage-1 soak).  Augment each record in place so the SAME dataset also
    # drives the full-cascade recipes on chip: a rectangle polygon
    # segmentation exactly at the GT box (matching the rendered rectangle),
    # a unit frontal plane, and a synthetic u16 millimeter depth map.
    import cv2 as _cv2
    depth_dir = os.path.join(args.root, "arti_depth")
    os.makedirs(depth_dir, exist_ok=True)
    ramp = (1500 + (np.arange(480)[:, None] * 4)
            + (np.arange(640)[None, :] % 128)).astype(np.uint16)  # mm
    for phase in ("train", "val", "test"):
        jf = os.path.join(args.root, "articulation",
                          f"cached_set_{phase}.json")
        with open(jf) as f:
            blob = json.load(f)
        for rec in blob["data"]:
            stem = os.path.splitext(os.path.basename(rec["file_name"]))[0]
            dp = os.path.join(depth_dir, f"{stem}.png")
            if not os.path.exists(dp):
                _cv2.imwrite(dp, ramp)
            rec["depth_path"] = dp
            for a in rec.get("annotations", []):
                x1, y1, x2, y2 = a["bbox"]  # XYXY_ABS (builder output)
                a["segmentation"] = [[x1, y1, x2, y1, x2, y2, x1, y2]]
                a["plane"] = [0.0, 0.0, 1.0]
        with open(jf, "w") as f:
            json.dump(blob, f)

    print(f"soak dataset ready under {args.root} "
          f"({len(train_ids)} train / {len(val_ids)} val / "
          f"{len(test_ids)} test videos; stage-3 targets augmented)")


if __name__ == "__main__":
    main()
