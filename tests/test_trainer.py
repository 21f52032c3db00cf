"""End-to-end trainer test: synthetic dataset -> few SGD steps -> eval."""

import json
import os

import cv2
import numpy as np
import pytest

import jax

from articulation3d_tpu.config import (Config, DepthHeadConfig, InputConfig,
                                       ModelConfig, ROIHeadsConfig, RPNConfig,
                                       SolverConfig, TestConfig)
from articulation3d_tpu.data.catalog import (DatasetMetadata,
                                             register_dataset)

# slow tier: full trainer loop integration (compiles the train step)
pytestmark = pytest.mark.slow

H, W = 128, 160


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """4 images with one axis-annotated box each, registered as a dataset."""
    root = tmp_path_factory.mktemp("tinyds")
    records = []
    rs = np.random.RandomState(0)
    for i in range(4):
        img = rs.randint(0, 255, (H, W, 3), np.uint8)
        cv2.rectangle(img, (40, 30), (100, 90), (250, 250, 250), -1)
        path = str(root / f"img_{i}.png")
        cv2.imwrite(path, img)
        records.append({
            "image_id": f"img_{i}", "file_name": path,
            "height": H, "width": W,
            "annotations": [{
                "bbox": [40, 30, 60, 60], "bbox_mode": 1, "category_id": 0,
                "segmentation": [[40, 30, 100, 30, 100, 90, 40, 90]],
                "plane": [0.0, 2.0, 0.0],
                "rot_axis": [45, 10, 45, 120], "tran_axis": None,
                "normal": [0.0, 0.0, 1.0],
            }],
        })
    json_path = root / "cached_set_train.json"
    json_path.write_text(json.dumps({
        "info": {}, "categories": [{"id": 1, "name": "arti_rot"},
                                   {"id": 2, "name": "arti_tran"}],
        "data": records}))
    meta = DatasetMetadata(
        name="tiny_arti", json_file=str(json_path), image_root=str(root),
        evaluator_type="arti",
        thing_classes=["arti_rot", "arti_tran"],
        thing_colors=[[0, 130, 200], [230, 25, 75]],
        thing_dataset_id_to_contiguous_id={1: 0, 2: 1})
    register_dataset("tiny_arti", lambda: records, meta)
    return records


def tiny_train_config(tmp_path):
    model = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=32, post_nms_topk_test=32,
                      pre_nms_topk_train=32, post_nms_topk_train=32),
        roi_heads=ROIHeadsConfig(detections_per_image=4,
                                 batch_size_per_image=8,
                                 score_thresh_test=0.0),
        depth_head=DepthHeadConfig(output_height=H, output_width=W),
        depth_on=False,  # no gt depth in the tiny dataset
        dtype="float32",
    )
    return Config(
        model=model, input=InputConfig(height=H, width=W),
        # lr kept small: on tiny noise images the early detector losses are
        # large, and the k-step-vs-per-step comparisons here only need the
        # trajectories finite and identical
        solver=SolverConfig(ims_per_batch=2, checkpoint_period=3,
                            base_lr=1e-6, warmup_iters=2),
        test=TestConfig(eval_period=0),
        datasets_train=("tiny_arti",), datasets_test=("tiny_arti",),
        output_dir=str(tmp_path / "exps"))


def test_trainer_steps_and_checkpoint(tiny_dataset, tmp_path):
    from articulation3d_tpu.train.trainer import Trainer
    from articulation3d_tpu.train.checkpoint import latest_checkpoint

    cfg = tiny_train_config(tmp_path)
    trainer = Trainer(cfg, use_mesh=False, max_instances=4)
    state0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    state = trainer.train(max_iter=3)
    assert int(np.asarray(state.step)) == 3
    # params changed
    changed = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.params, state0)
    assert max(jax.tree_util.tree_leaves(changed)) > 0
    # checkpoint written at step 3
    ckpt = latest_checkpoint(cfg.output_dir)
    assert ckpt is not None and ckpt.endswith("step_00000003")

    # resume restores the step counter
    trainer2 = Trainer(cfg, use_mesh=False, max_instances=4)
    trainer2.resume_or_load(resume=True)
    assert int(np.asarray(trainer2.state.step)) == 3


def test_multi_step_identity():
    """k-step fused dispatch (lax.scan) computes the SAME loss curve and
    final params as k separate step_fn calls with the same key (VERDICT r4
    next #1: the fix must not change numerics)."""
    import dataclasses

    import jax.numpy as jnp

    from articulation3d_tpu.config import step1_bbox_config
    from articulation3d_tpu.train.optimizer import build_optimizer
    from articulation3d_tpu.train.train_step import (
        create_train_state, make_multi_step, make_train_step, stack_batches)

    cfg = step1_bbox_config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            rpn=RPNConfig(pre_nms_topk_train=16, post_nms_topk_train=16,
                          pre_nms_topk_test=16, post_nms_topk_test=16),
            roi_heads=ROIHeadsConfig(batch_size_per_image=8,
                                     detections_per_image=4),
            dtype="float32"),
        input=InputConfig(height=64, width=96),
        # lr low enough that an untrained net on NOISE images (no real
        # statistics; losses start in the hundreds) stays finite over the
        # 4 compared steps — the test pins path identity, not convergence
        solver=SolverConfig(ims_per_batch=2, warmup_iters=2, base_lr=1e-6))
    rng = jax.random.PRNGKey(0)
    model, state_a = create_train_state(cfg, rng)
    tx = build_optimizer(cfg, state_a.params)
    step = make_train_step(cfg, model, tx)

    rs = np.random.RandomState(1)
    batches = []
    for _ in range(4):
        boxes = np.array([[[10, 8, 40, 30], [30, 20, 80, 55]]] * 2, np.float32)
        batches.append({
            # RAW pixel domain (the step normalizes on device)
            "images": rs.randint(0, 256, (2, 64, 96, 3)).astype(np.uint8),
            "gt_boxes": boxes,
            "gt_classes": rs.randint(0, 2, (2, 2)).astype(np.int32),
            "gt_valid": np.ones((2, 2), bool),
        })
    key = jax.random.PRNGKey(7)

    step_j = jax.jit(step)
    losses_a = []
    for b in batches:
        state_a, m = step_j(state_a, b, key)
        losses_a.append(float(m["total_loss"]))

    _, state_b = create_train_state(cfg, rng)
    multi = jax.jit(make_multi_step(step, 4))
    state_b, metrics = multi(state_b, stack_batches(batches), key)
    losses_b = [float(v) for v in np.asarray(metrics["total_loss"])]

    assert int(np.asarray(state_b.step)) == 4
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    da = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state_a.params, state_b.params)
    assert max(jax.tree_util.tree_leaves(da)) < 1e-5


def test_trainer_multi_step_dispatch(tiny_dataset, tmp_path):
    """Trainer with steps_per_dispatch=2 matches the per-step loop's final
    params (same loader seed => same batch order) and still checkpoints."""
    import dataclasses

    from articulation3d_tpu.train.checkpoint import latest_checkpoint
    from articulation3d_tpu.train.trainer import Trainer

    cfg1 = tiny_train_config(tmp_path / "k1")
    t1 = Trainer(cfg1, use_mesh=False, max_instances=4)
    s1 = t1.train(max_iter=4)

    cfgk = tiny_train_config(tmp_path / "k2")
    cfgk = cfgk.replace(solver=dataclasses.replace(
        cfgk.solver, steps_per_dispatch=2))
    tk = Trainer(cfgk, use_mesh=False, max_instances=4)
    assert tk._multi_fn is not None
    sk = tk.train(max_iter=4)

    assert int(np.asarray(sk.step)) == 4
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.params, sk.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
    # checkpoint period 3 crosses inside the second chunk; with k-step
    # dispatch it fires at the CHUNK BOUNDARY (step 4) so the label always
    # matches the state it contains
    ckpt = latest_checkpoint(cfgk.output_dir)
    assert ckpt is not None and ckpt.endswith("step_00000004")
    # metrics.json carries per-step lines from the stacked metrics
    assert os.path.exists(os.path.join(cfgk.output_dir, "metrics.json"))


def test_train_vis_hook(tiny_dataset, tmp_path):
    """vis_period writes GT|pred panels during training (reference
    VIS_PERIOD/MODEL.VIS_MINIBATCH, config/config.yaml:367)."""
    import dataclasses

    from articulation3d_tpu.train.trainer import Trainer

    cfg = tiny_train_config(tmp_path)
    cfg = cfg.replace(test=dataclasses.replace(cfg.test, vis_period=2))
    trainer = Trainer(cfg, use_mesh=False, max_instances=4)
    trainer.train(max_iter=2)
    out = os.path.join(cfg.output_dir, "vis", "iter_0000002.png")
    assert os.path.exists(out)
    img = cv2.imread(out)
    assert img is not None and img.shape == (H, 2 * W, 3)


def test_trainer_eval_runs(tiny_dataset, tmp_path):
    from articulation3d_tpu.train.trainer import Trainer

    cfg = tiny_train_config(tmp_path)
    trainer = Trainer(cfg, use_mesh=False, max_instances=4)
    results = trainer.test()
    assert "tiny_arti" in results
    res = results["tiny_arti"]
    # recognition + the four articulation APs on arti_rot are present
    assert "auroc" in res or "accuracy" in res
    assert "bbox - arti_rot" in res
    assert np.isfinite(res["bbox - arti_rot"])

def test_trainer_eval_lands_in_metrics_json(tiny_dataset, tmp_path):
    """Periodic eval results are persisted to metrics.json (d2 writes its
    eval metric dicts there too), tagged with the firing iteration."""
    import dataclasses

    from articulation3d_tpu.train.trainer import Trainer

    cfg = tiny_train_config(tmp_path)
    cfg = cfg.replace(test=dataclasses.replace(cfg.test, eval_period=2))
    trainer = Trainer(cfg, use_mesh=False, max_instances=4)
    trainer.train(max_iter=2)
    rows = [json.loads(l) for l in
            open(os.path.join(cfg.output_dir, "metrics.json"))]
    evals = [r for r in rows if r.get("eval_dataset") == "tiny_arti"]
    assert len(evals) == 1 and evals[0]["iteration"] == 2
    assert "bbox - arti_rot" in evals[0]
