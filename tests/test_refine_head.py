"""Refine head: shapes, loss, and reference-semantics unit checks.

Reference: `modeling/refine_net/refine_head.py:25-290`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulation3d_tpu.config import (Config, DepthHeadConfig, InputConfig,
                                       ModelConfig, RefineHeadConfig,
                                       ROIHeadsConfig, RPNConfig)
from articulation3d_tpu.models.refine_head import (
    RefineHead, assign_pred_masks, plane_xyz_module, recompute_plane_offsets,
    refine_inference_masks, refine_loss_single, refine_ranges)

H, W = 64, 80
D = 4


def test_refine_ranges_convention():
    """ranges = [u, 1, -v] with half-pixel centers (refine_head.py:167-176)."""
    r = refine_ranges(480, 640, 571.623718)
    assert r.shape == (480, 640, 3)
    # center pixel has u ~ 0; y component always 1; z flips sign top/bottom
    assert abs(r[240, 320, 0]) < 1e-3
    assert np.all(r[:, :, 1] == 1.0)
    assert r[0, 0, 2] > 0 and r[-1, 0, 2] < 0
    # reference formula at corner (0,0): u = (0.5 - 320)/f
    assert np.isclose(r[0, 0, 0], (0.5 - 320.0) / 571.623718)


def test_plane_xyz_module_depth_clamp():
    ranges = jnp.asarray(refine_ranges(H, W))
    planes = jnp.asarray([[0.0, 2.0, 0.0],      # frontal plane, offset 2
                          [0.0, 1e-6, 0.0]])    # near-zero offset
    xyz = plane_xyz_module(planes, ranges, max_depth=10.0)
    assert xyz.shape == (2, H, W, 3)
    # frontal plane: depth (y component) == offset / (n.r) with n=[0,1,0]
    np.testing.assert_allclose(np.asarray(xyz[0, :, :, 1]), 2.0, atol=1e-5)
    assert float(jnp.max(xyz[:, :, :, 1])) <= 10.0 + 1e-5


def test_recompute_plane_offsets_exact():
    """Constant depth + frontal normal -> offset == depth inside the mask."""
    ranges = jnp.asarray(refine_ranges(H, W))
    normals = jnp.asarray([[0.0, 1.0, 0.0]])
    masks = jnp.zeros((1, H, W)).at[:, 10:30, 20:50].set(1.0)
    depth = jnp.full((H, W), 3.0)
    planes = recompute_plane_offsets(normals, masks, depth, ranges)
    np.testing.assert_allclose(np.asarray(planes), [[0.0, 3.0, 0.0]], atol=1e-5)


def test_assign_pred_masks_mutual_best():
    gt = np.zeros((3, H, W), np.float32)
    gt[0, 0:20, 0:20] = 1
    gt[1, 30:50, 30:50] = 1
    gt_valid = np.array([True, True, False])
    pred = np.zeros((D, H, W), np.float32)
    pred[0, 2:18, 2:18] = 0.9     # matches gt0
    pred[1, 32:48, 32:48] = 0.9   # matches gt1
    pred[2, 31:49, 31:49] = 0.9   # also overlaps gt1, smaller intersection
    pred_valid = np.array([True, True, True, False])
    seg, wt = jax.jit(assign_pred_masks)(
        jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(pred),
        jnp.asarray(pred_valid))
    seg, wt = np.asarray(seg), np.asarray(wt)
    assert seg[0] == 0 and seg[1] == 1
    assert wt[0] == 1.0
    # pred2 overlaps gt1 MORE than pred1 (18x18 vs 16x16 inside) -> pred2 is
    # gt1's mutual best, pred1 loses (reference mutual-best semantics)
    assert wt[2] == 1.0 and wt[1] == 0.0
    assert wt[3] == 0.0  # padded detection never supervised


def _tiny_refine_cfg():
    return RefineHeadConfig(height=32, width=40)


def test_refine_head_forward_and_loss():
    cfg = _tiny_refine_cfg()
    head = RefineHead(cfg)
    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.randint(0, 255, (H, W, 3)).astype(np.float32))
    masks = jnp.zeros((D, H, W)).at[0, 5:25, 5:25].set(0.8)
    masks = masks.at[1, 30:50, 30:60].set(0.9)
    planes = jnp.asarray(rs.randn(D, 3).astype(np.float32))
    planes = planes / jnp.linalg.norm(planes, axis=1, keepdims=True)
    depth = jnp.asarray(np.abs(rs.randn(H, W)).astype(np.float32) + 1.0)
    valid = jnp.asarray([True, True, False, False])

    variables = head.init(jax.random.PRNGKey(0), image, masks, planes,
                          depth, valid)
    logits, plane_params = head.apply(variables, image, masks, planes,
                                      depth, valid)
    assert logits.shape == (D + 1, cfg.height, cfg.width)
    assert plane_params.shape == (D, 3)
    assert np.all(np.isfinite(np.asarray(logits)))
    # invalid instances get zero plane params
    np.testing.assert_allclose(np.asarray(plane_params[2:]), 0.0)

    # inference mask extraction: one-hot rows for valid instances only
    full = refine_inference_masks(logits, valid, H, W)
    assert full.shape == (D, H, W)
    np.testing.assert_allclose(np.asarray(full[2:]), 0.0)

    # loss: finite, positive, zero when nothing valid
    gt = jnp.zeros((3, H, W)).at[0, 5:25, 5:25].set(1.0)
    gt_valid = jnp.asarray([True, False, False])
    loss = refine_loss_single(logits, gt, gt_valid, masks, valid)
    assert np.isfinite(float(loss)) and float(loss) > 0
    zero = refine_loss_single(logits, gt, gt_valid, masks,
                              jnp.zeros((D,), bool))
    assert float(zero) == 0.0


def test_refine_accumulate_excludes_invalid():
    """Cross-instance pooling must not leak padded-instance features."""
    from articulation3d_tpu.models.refine_head import RefinementBlock

    x = jnp.ones((3, 8, 8, 2))
    x = x.at[2].set(1e6)  # garbage padded row
    valid = jnp.asarray([True, True, False])
    out = RefinementBlock._accumulate(x, valid)
    # 'others' channel for row 0 = row 1 only (count-1 = 1)
    np.testing.assert_allclose(np.asarray(out[0, :, :, 2:]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, :, :, 2:]), 1.0, atol=1e-6)


@pytest.mark.slow  # whole-model train_forward compile: 209s of a 380s tier
def test_refine_train_forward_end_to_end():
    """refine_on=True: train_forward emits refine outputs and the loss is
    differentiable into the refine params."""
    from articulation3d_tpu.models.planercnn import PlaneRCNN, init_params
    from articulation3d_tpu.train.targets import detection_losses

    model_cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=16, post_nms_topk_test=16,
                      pre_nms_topk_train=16, post_nms_topk_train=16),
        roi_heads=ROIHeadsConfig(detections_per_image=4,
                                 batch_size_per_image=8,
                                 score_thresh_test=0.0),
        depth_head=DepthHeadConfig(output_height=H, output_width=W),
        refine_head=_tiny_refine_cfg(),
        refine_on=True, dtype="float32",
    )
    cfg = Config(model=model_cfg, input=InputConfig(height=H, width=W))
    model, variables = init_params(cfg, jax.random.PRNGKey(0))
    assert "refine_head" in variables["params"], "refine params must exist"

    b, g = 1, 2
    rs = np.random.RandomState(0)
    masks = np.zeros((b, g, H, W), np.float32)
    masks[:, 0, 10:30, 15:45] = 1.0
    masks[:, 1, 35:55, 20:40] = 1.0
    batch = {
        "images": rs.randn(b, H, W, 3).astype(np.float32),
        "gt_boxes": np.tile(np.asarray([[15, 10, 45, 30], [20, 35, 40, 55]],
                                       np.float32), (b, 1, 1)),
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_valid": np.ones((b, g), bool),
        "gt_masks": masks,
        "gt_planes": np.tile(np.asarray([0.0, 1.0, 0.0], np.float32), (b, g, 1)),
        "gt_rot_axis": np.tile(np.asarray([0.6, 0.8, 0.1, 1.0], np.float32), (b, g, 1)),
        "gt_tran_axis": np.tile(np.asarray([0.6, 0.8, 0.0, 1.0], np.float32), (b, g, 1)),
        "gt_depth": np.abs(rs.randn(b, H, W)).astype(np.float32) + 1.0,
    }

    def loss_fn(params):
        (outputs, rois), _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            jnp.asarray(batch["images"]), jnp.asarray(batch["gt_boxes"]),
            jnp.asarray(batch["gt_classes"]), jnp.asarray(batch["gt_valid"]),
            jax.random.PRNGKey(1), method=PlaneRCNN.train_forward,
            mutable=["batch_stats"])
        gt = {"boxes": jnp.asarray(batch["gt_boxes"]),
              "classes": jnp.asarray(batch["gt_classes"]),
              "valid": jnp.asarray(batch["gt_valid"]),
              "masks": jnp.asarray(batch["gt_masks"]),
              "planes": jnp.asarray(batch["gt_planes"]),
              "rot_axis": jnp.asarray(batch["gt_rot_axis"]),
              "tran_axis": jnp.asarray(batch["gt_tran_axis"]),
              "depth": jnp.asarray(batch["gt_depth"])}
        losses = detection_losses(outputs, rois, gt, cfg)
        assert "refine_loss" in losses
        return losses["refine_loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_map(
        lambda x: float(jnp.abs(x).max()), grads["refine_head"])
    assert max(jax.tree_util.tree_leaves(gnorm)) > 0, \
        "refine loss must backprop into refine params"
