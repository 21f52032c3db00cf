"""Full 3-stage recipe integration at tiny scale (VERDICT r2 next-round #5).

One slow test proving the RECIPE works end to end, not just each piece:

    synthetic CSVs -> tools/generate_arti (cached_set JSONs)
      -> stage-1 bbox (reference `config/step1_bbox.yaml`)
      -> stage-2 axis, frozen detector, warm-start from the stage-1 orbax
         checkpoint (`config/step2_axis.yaml:7-10`)
      -> stage-3 mask+plane+depth, frozen detector AND axis head,
         warm-start from STAGE-1 (the reference quirk: stage 3 restarts
         from a stage-1 checkpoint, not stage-2 — SURVEY.md §3.5,
         `config/step3_plane.yaml:8`)
      -> ArtiEvaluator via Trainer.test()
      -> tools/opt_arti.py --load-results shard-merge path
         (`tools/opt_arti.py:126-157,336-351`).

Freeze transitions are asserted on the actual parameter values: frozen
subtrees are bit-identical across a stage's SGD steps, trainable heads move.
"""

import copy
import json
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

pytestmark = pytest.mark.slow

# tiny training resolution: the builder emits 640x480 records; the recipe
# run rescales them 1/5 so three CPU train-step compiles stay affordable
RH, RW = 96, 128
SCALE_X, SCALE_Y = RW / 640.0, RH / 480.0


def _seg(x1, y1, x2, y2):
    return json.dumps([{"label": "axis",
                        "p1": {"x": x1, "y": y1}, "p2": {"x": x2, "y": y2}}])


def _box(label, x1, y1, x2, y2):
    return json.dumps([{"label": label,
                        "p1": {"x": x1, "y": y1}, "p2": {"x": x2, "y": y2}}])


def _rescale_record(rec, depth_path):
    """640x480 builder record -> RHxRW recipe record (+ plane/normal/depth
    the arti CSVs don't carry, so stage 3 has every loss target)."""
    out = copy.deepcopy(rec)
    out["height"], out["width"] = RH, RW
    out["depth_path"] = depth_path
    for ann in out["annotations"]:
        b = ann["bbox"]
        ann["bbox"] = [b[0] * SCALE_X, b[1] * SCALE_Y,
                       b[2] * SCALE_X, b[3] * SCALE_Y]
        for k in ("rot_axis", "tran_axis"):
            if ann.get(k) is not None:
                a = ann[k]
                ann[k] = [a[0] * SCALE_X, a[1] * SCALE_Y,
                          a[2] * SCALE_X, a[3] * SCALE_Y]
        if ann.get("segmentation"):
            ann["segmentation"] = [
                [v * (SCALE_X if i % 2 == 0 else SCALE_Y)
                 for i, v in enumerate(poly)]
                for poly in ann["segmentation"]]
        else:
            # box-shaped mask so the stage-3 mask loss has a real target
            x0, y0, x1, y1 = ann["bbox"]
            ann["segmentation"] = [[x0, y0, x1, y0, x1, y1, x0, y1]]
        ann["plane"] = [0.0, 0.0, 1.0]
        ann["normal"] = [0.0, 0.0, 1.0]
    return out


@pytest.fixture(scope="module")
def recipe_datasets(tmp_path_factory):
    """CSV fixtures -> generate_arti -> rescaled registered datasets."""
    import csv

    import cv2

    from generate_arti import ArtiDataset
    from articulation3d_tpu.data.catalog import (DatasetMetadata,
                                                 register_dataset)

    tmp = tmp_path_factory.mktemp("recipe")
    root, frames, neg = tmp / "benchmark", tmp / "frames", tmp / "frames_neg"
    for d in (root, frames, neg):
        d.mkdir()

    train_ids = ("AAAAAAAAAAA", "DDDDDDDDDDD")
    val_id = "BBBBBBBBBBB"
    (root / "val.txt").write_text(f"{val_id}_001_05\n")
    (root / "test.txt").write_text("")

    rs = np.random.RandomState(0)
    for yt in train_ids + (val_id,):
        for fid in (5, 45):
            img = rs.randint(0, 80, (480, 640, 3), np.uint8)
            cv2.rectangle(img, (256, 192), (384, 288), (250, 250, 250), -1)
            cv2.imwrite(str(frames / f"{yt}_001_{fid}.png"), img)
        cv2.imwrite(str(neg / f"{yt}_009_05.png"),
                    rs.randint(0, 80, (480, 640, 3), np.uint8))

    # center-tile rotation boxes for both train ids, tile-0 translation for val
    rows = [{"original_filename": f"{yt}_001.png",
             "status": _box("rotation", 0.40, 0.40, 0.60, 0.60)}
            for yt in train_ids]
    rows.append({"original_filename": f"{val_id}_001.png",
                 "status": _box("translation", 0.05, 0.05, 0.30, 0.30)})
    rows.append({"original_filename": f"{train_ids[0]}_002.png",
                 "status": "[]"})    # one negative frame in train
    fields = ["original_filename", "image_url", "status"]
    with open(tmp / "step3.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fields)
        w.writeheader()
        for r in rows:
            w.writerow({"image_url": "", **r})
    with open(tmp / "step4.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fields)
        w.writeheader()
        for yt in train_ids:
            w.writerow({"original_filename": f"{yt}_001.png",
                        "image_url": "", "status": _seg(0.5, 0.42, 0.5, 0.58)})
    with open(tmp / "step5.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fields)
        w.writeheader()
        w.writerow({"original_filename": f"{val_id}_001.png",
                    "image_url": "", "status": _seg(0.1, 0.1, 0.3, 0.3)})

    ds = ArtiDataset(str(root), str(frames), str(neg), str(tmp / "step3.csv"),
                     str(tmp / "step4.csv"), str(tmp / "step5.csv"))
    dumped = {p: ds.dump(p) for p in ("train", "val", "test")}
    ds.sanity_check()

    # synthetic uint16 depth (mm) at the recipe resolution
    import cv2 as _cv2
    depth_path = str(tmp / "depth.png")
    depth = (2000 + 500 * np.linspace(0, 1, RH)[:, None]
             * np.ones((1, RW))).astype(np.uint16)
    _cv2.imwrite(depth_path, depth)

    names = {}
    for phase in ("train", "val"):
        records = [_rescale_record(r, depth_path)
                   for r in dumped[phase]["data"]]
        json_path = str(root / f"cached_set_recipe_{phase}.json")
        with open(json_path, "w") as f:
            json.dump({"info": dumped[phase]["info"],
                       "categories": dumped[phase]["categories"],
                       "data": records}, f)
        name = f"recipe_{phase}"
        meta = DatasetMetadata(
            name=name, json_file=json_path, image_root=str(frames),
            evaluator_type="arti",
            thing_classes=["arti_rot", "arti_tran"],
            thing_colors=[[0, 130, 200], [230, 25, 75]],
            thing_dataset_id_to_contiguous_id={0: 0, 1: 1})
        register_dataset(name, (lambda rs_: (lambda: rs_))(records), meta)
        names[phase] = name
    return names


def _tiny_cfg(stage: int, output_dir: str, weights: str = ""):
    """Tiny-shape analog of step{1,2,3}_config (same toggles + freeze)."""
    import dataclasses

    from articulation3d_tpu.config import (Config, DepthHeadConfig,
                                           InputConfig, ROIHeadsConfig,
                                           RPNConfig, SolverConfig,
                                           TestConfig, step1_bbox_config,
                                           step2_axis_config,
                                           step3_plane_config)

    recipe = (step1_bbox_config, step2_axis_config, step3_plane_config)[stage - 1]()
    model = dataclasses.replace(
        recipe.model,
        rpn=RPNConfig(pre_nms_topk_test=32, post_nms_topk_test=32,
                      pre_nms_topk_train=32, post_nms_topk_train=32),
        roi_heads=ROIHeadsConfig(detections_per_image=4,
                                 batch_size_per_image=8,
                                 score_thresh_test=0.0),
        depth_head=DepthHeadConfig(output_height=RH, output_width=RW),
        dtype="float32")
    return Config(
        model=model, input=InputConfig(height=RH, width=RW),
        solver=SolverConfig(ims_per_batch=2, checkpoint_period=2,
                            base_lr=1e-3, warmup_iters=2),
        test=TestConfig(eval_period=0),
        datasets_train=("recipe_train",), datasets_test=("recipe_val",),
        output_dir=output_dir, weights=weights)


def _np_params(state):
    return jax.tree_util.tree_map(np.asarray, state.params)


def _subtree_delta(a, b, top_key):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(np.abs(np.asarray(x, np.float64)
                                  - np.asarray(y, np.float64)).max()),
        a[top_key], b[top_key])
    return max(jax.tree_util.tree_leaves(diffs))


def test_full_recipe(recipe_datasets, tmp_path):
    from articulation3d_tpu.train.checkpoint import latest_checkpoint
    from articulation3d_tpu.train.trainer import Trainer

    # ---- stage 1: detector only ------------------------------------------
    cfg1 = _tiny_cfg(1, str(tmp_path / "s1"))
    tr1 = Trainer(cfg1, use_mesh=False, max_instances=4)
    tr1.resume_or_load(resume=False)   # no COCO-zoo pkl in this environment
    assert "axis_head" not in tr1.state.params  # stage 1 has no aux heads
    st1 = tr1.train(max_iter=2)
    assert int(np.asarray(st1.step)) == 2
    ckpt1 = latest_checkpoint(cfg1.output_dir)
    assert ckpt1 is not None
    p1 = _np_params(st1)

    # ---- stage 2: axis head, frozen detector, warm-start from stage 1 ----
    cfg2 = _tiny_cfg(2, str(tmp_path / "s2"), weights=cfg1.output_dir)
    tr2 = Trainer(cfg2, use_mesh=False, max_instances=4)
    tr2.resume_or_load(resume=False)
    warm2 = _np_params(tr2.state)
    # the detector warm-started to the exact stage-1 values; the axis head
    # is fresh (absent from the stage-1 tree)
    assert _subtree_delta(warm2, p1, "backbone") == 0.0
    assert _subtree_delta(warm2, p1, "box_head") == 0.0
    assert "axis_head" in warm2
    assert int(np.asarray(tr2.state.step)) == 0   # never restore the step

    st2 = tr2.train(max_iter=2)
    p2 = _np_params(st2)
    # frozen modules did not move; the axis head trained
    for frozen in ("backbone", "fpn", "rpn", "box_head"):
        assert _subtree_delta(p2, warm2, frozen) == 0.0, frozen
    assert _subtree_delta(p2, warm2, "axis_head") > 0.0

    # ---- stage 3: mask+plane+depth, warm-start from STAGE 1 (ref quirk) --
    cfg3 = _tiny_cfg(3, str(tmp_path / "s3"), weights=cfg1.output_dir)
    tr3 = Trainer(cfg3, use_mesh=False, max_instances=4)
    tr3.resume_or_load(resume=False)
    warm3 = _np_params(tr3.state)
    assert _subtree_delta(warm3, p1, "backbone") == 0.0
    st3 = tr3.train(max_iter=2)
    p3 = _np_params(st3)
    for frozen in ("backbone", "rpn", "box_head", "axis_head"):
        assert _subtree_delta(p3, warm3, frozen) == 0.0, frozen
    for trained in ("mask_head", "plane_head", "depth_head"):
        assert _subtree_delta(p3, warm3, trained) > 0.0, trained

    # training losses logged and finite (metrics.json written by the loop)
    with open(os.path.join(cfg3.output_dir, "metrics.json")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert lines and all(np.isfinite(l["total_loss"]) for l in lines)
    assert {"loss_mask", "loss_plane", "depth_loss"} <= set(lines[-1])

    # ---- evaluator wiring on the stage-3 model ---------------------------
    results = tr3.test()
    res = results["recipe_val"]
    assert "bbox - arti_tran" in res and np.isfinite(res["bbox - arti_tran"])
    assert any(k.startswith("bbox+axis") for k in res)


def test_opt_arti_merge_path(recipe_datasets, tmp_path, capsys, monkeypatch):
    """`opt_arti.py --load-results`: merge SLURM-array shard .pth files and
    run the ArtiEvaluator directly (`tools/opt_arti.py:126-157,336-351`)."""
    import torch
    import yaml

    import opt_arti

    from articulation3d_tpu.data.catalog import get_dataset_dicts
    from articulation3d_tpu.data.axis_codec import axis_to_angle_offset

    out = tmp_path / "opt_out"
    out.mkdir()
    cfg_yaml = tmp_path / "recipe.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "input": {"height": RH, "width": RW},
        "output_dir": str(out)}))

    # two shards, one prediction each, built from the val GT (near-perfect
    # detections so the merged evaluation yields nonzero APs)
    records = [r for r in get_dataset_dicts("recipe_val")
               if r["annotations"]]
    assert records
    shard_preds = []
    for rec in records:
        ann = rec["annotations"][0]
        x0, y0, x1, y1 = ann["bbox"]
        center = np.asarray([[(x0 + x1) / 2.0, (y0 + y1) / 2.0]], np.float64)
        axis = ann.get("tran_axis") or ann.get("rot_axis")
        enc = axis_to_angle_offset(np.asarray([axis], np.float64), center)[0]
        shard_preds.append({
            "image_id": rec["image_id"],
            "file_name": rec["file_name"],
            "instances": [{
                "image_id": rec["image_id"],
                "category_id": int(ann["category_id"]),
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "score": 0.98,
            }],
            "pred_rot_axis": np.asarray([enc[:3]], np.float64),
            "pred_tran_axis": np.asarray([enc[:2]], np.float64),
            "pred_plane": np.asarray([[0.0, 0.0, 1.0]], np.float64),
        })
    # pad to two shard files (second may be empty — the merge must cope)
    torch.save({"predictions": shard_preds, "corrs": [0.5, np.nan],
                "corrs_opt": [0.9]}, str(out / "predictions_0000.pth"))
    torch.save({"predictions": [], "corrs": [], "corrs_opt": []},
               str(out / "predictions_0001.pth"))

    monkeypatch.setattr(sys, "argv", [
        "opt_arti.py", "--config", str(cfg_yaml), "--load-results",
        "--input", str(out / "predictions_0000.pth"),
        "--output", str(out), "--dataset", "recipe_val"])
    opt_arti.main()
    printed = capsys.readouterr().out
    assert "[number of predictions]: 1" in printed
    assert "bbox - arti_tran" in printed
