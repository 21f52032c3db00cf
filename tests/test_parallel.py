"""Multi-device mesh correctness on the 8 virtual CPU devices.

These tests fail if `parallel/mesh.py` or the pjit'd programs regress:
  * sharded train step == single-device train step (loss + param parity);
  * VideoPipeline(use_mesh=True) == unsharded pipeline outputs;
  * gather_predictions round-trip;
  * pad_to_multiple trim contract.

SURVEY.md §4 prescribes exactly this validation path
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`, set by conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulation3d_tpu.config import (Config, DepthHeadConfig, InputConfig,
                                       ModelConfig, ROIHeadsConfig, RPNConfig)
from articulation3d_tpu.parallel import (batch_sharding, make_mesh,
                                         pad_to_multiple, replicate,
                                         shard_batch)
from articulation3d_tpu.parallel.dist import gather_predictions

# slow tier: 8-device virtual mesh: every collective is a multi-second single-core rendezvous
pytestmark = pytest.mark.slow

H, W = 64, 80
N_DEV = 8


def _tiny_config():
    # kept MINIMAL: XLA:CPU conv grads dominate this suite's runtime and
    # scale with the sampled-ROI count (same reason the multichip dryrun
    # uses few ROIs/image) — sharding equivalence needs tiny shapes only
    model = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=16, post_nms_topk_test=16,
                      pre_nms_topk_train=16, post_nms_topk_train=16),
        roi_heads=ROIHeadsConfig(detections_per_image=2,
                                 batch_size_per_image=2,
                                 score_thresh_test=0.0),
        depth_head=DepthHeadConfig(output_height=H, output_width=W),
        dtype="float32",
    )
    return Config(model=model, input=InputConfig(height=H, width=W))


def _train_batch(b, rs):
    g = 2
    masks = np.zeros((b, g, H, W), np.float32)
    masks[:, :, 10:30, 15:45] = 1.0
    return {
        "images": rs.randn(b, H, W, 3).astype(np.float32),
        "gt_boxes": np.tile(np.asarray([[15, 10, 45, 30]], np.float32),
                            (b, g, 1)),
        "gt_classes": rs.randint(0, 2, (b, g)).astype(np.int32),
        "gt_valid": np.tile(np.asarray([True, True]), (b, 1)),
        "gt_masks": masks,
        "gt_planes": np.tile(np.asarray([0.0, 1.0, 0.0], np.float32),
                             (b, g, 1)),
        "gt_rot_axis": np.tile(np.asarray([0.6, 0.8, 0.1, 1.0], np.float32),
                               (b, g, 1)),
        "gt_tran_axis": np.tile(np.asarray([0.6, 0.8, 0.0, 1.0], np.float32),
                                (b, g, 1)),
        "gt_depth": np.abs(rs.randn(b, H, W)).astype(np.float32) + 1.0,
    }


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == N_DEV
    assert mesh.axis_names == ("data",)


def test_sharded_train_step_matches_single_device():
    """Loss + updated params must be identical (up to fp tolerance) whether
    the batch runs sharded over the mesh or on one device.

    Runs on a 2-device sub-mesh: sharding propagation and the gradient
    psum are identical for any mesh size, and virtual-device CPU execution
    is per-op-dispatch bound — each extra device thread multiplies the
    step's thousands of op dispatches on this single core (measured: 15s
    on 1 device, ~6 min on 4, ~19 min on 8 for the SAME batch).  The
    8-device path is still exercised by the (conv-only, cheaper) video
    pipeline test below and by `__graft_entry__.dryrun_multichip`.
    """
    from articulation3d_tpu.train.optimizer import build_optimizer
    from articulation3d_tpu.train.train_step import (create_train_state,
                                                     make_train_step)

    cfg = _tiny_config()
    rng = jax.random.PRNGKey(0)
    model, state = create_train_state(cfg, rng)
    tx = build_optimizer(cfg, state.params)
    train_step = make_train_step(cfg, model, tx)
    batch = _train_batch(N_DEV, np.random.RandomState(0))
    key = jax.random.PRNGKey(1)

    # single device (no donation: state reused below)
    ref_state, ref_metrics = jax.jit(train_step)(state, batch, key)
    ref_metrics = {k: float(v) for k, v in ref_metrics.items()}

    mesh = make_mesh(jax.devices()[:2])
    with mesh:
        sh_state = replicate(mesh, state)
        device_batch = shard_batch(mesh, batch)
        new_state, metrics = jax.jit(train_step)(sh_state, device_batch,
                                                 replicate(mesh, key))
        jax.block_until_ready(new_state.params)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
        np.testing.assert_allclose(float(v), ref_metrics[k], rtol=2e-4,
                                   err_msg=f"loss {k} diverges under mesh")

    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_mesh = jax.tree_util.tree_leaves(new_state.params)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(flat_ref, flat_mesh))
    assert worst < 1e-4, f"params diverge under mesh: {worst}"


def test_video_pipeline_mesh_matches_unsharded():
    from articulation3d_tpu.models.planercnn import init_params
    from articulation3d_tpu.video.pipeline import VideoPipeline

    cfg = _tiny_config()
    model, variables = init_params(cfg, jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    frames = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(N_DEV)]

    plain = VideoPipeline(cfg, model, variables, batch_size=N_DEV,
                          conf_threshold=0.0, use_mesh=False)
    meshed = VideoPipeline(cfg, model, variables, batch_size=N_DEV,
                           conf_threshold=0.0, use_mesh=True)
    p_out = plain.run(frames)
    m_out = meshed.run(frames)
    assert len(p_out) == len(m_out) == N_DEV
    for a, b in zip(p_out, m_out):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-3)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-4)
        np.testing.assert_array_equal(a.classes, b.classes)
        np.testing.assert_allclose(a.planes, b.planes, atol=1e-4)


def test_gather_predictions_single_process_roundtrip():
    preds = [{"image_id": i, "boxes": np.arange(4) * i} for i in range(5)]
    out = gather_predictions(preds)
    assert len(out) == 5
    np.testing.assert_array_equal(out[3]["boxes"], np.arange(4) * 3)


def test_pad_to_multiple_trims():
    batch = {"x": np.arange(10, dtype=np.float32).reshape(5, 2)}
    padded, n = pad_to_multiple(batch, 4)
    assert n == 5 and padded["x"].shape == (8, 2)
    np.testing.assert_array_equal(padded["x"][5:], np.tile(batch["x"][-1:], (3, 1)))
    same, n2 = pad_to_multiple(batch, 5)
    assert n2 == 5 and same["x"].shape == (5, 2)
