"""Smoke + shape tests for the PlaneRCNN meta-architecture (CPU, tiny config)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from articulation3d_tpu.config import (Config, ModelConfig, InputConfig,
                                       RPNConfig, ROIHeadsConfig, AnchorConfig,
                                       DepthHeadConfig, ResNetConfig)
from articulation3d_tpu.models import PlaneRCNN, init_params

# slow tier: whole-model compile tests
pytestmark = pytest.mark.slow


def tiny_config(**model_kw) -> Config:
    model = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=64, post_nms_topk_test=64,
                      pre_nms_topk_train=64, post_nms_topk_train=64),
        roi_heads=ROIHeadsConfig(detections_per_image=8, batch_size_per_image=16),
        depth_head=DepthHeadConfig(output_height=128, output_width=160),
        dtype="float32",
        **model_kw,
    )
    return Config(model=model, input=InputConfig(height=128, width=160))


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    model, variables = init_params(cfg, rng)
    return cfg, model, variables


def test_inference_shapes(tiny_model):
    cfg, model, variables = tiny_model
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 128, 160, 3), jnp.float32)
    out = model.apply(variables, imgs, method=PlaneRCNN.inference)
    det = out["detections"]
    D = cfg.model.roi_heads.detections_per_image
    assert det.boxes.shape == (2, D, 4)
    assert det.scores.shape == (2, D)
    assert det.classes.shape == (2, D)
    assert det.valid.shape == (2, D)
    assert det.masks.shape == (2, D, 28, 28)
    assert det.planes.shape == (2, D, 3)
    assert det.rot_axis.shape == (2, D, 3)
    assert det.tran_axis.shape == (2, D, 2)
    assert out["depth"].shape == (2, 128, 160)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
    # plane normals and axis sin/cos are unit-norm
    pn = np.linalg.norm(np.asarray(det.planes), axis=-1)
    np.testing.assert_allclose(pn, 1.0, atol=1e-5)
    rn = np.linalg.norm(np.asarray(det.rot_axis[..., :2]), axis=-1)
    np.testing.assert_allclose(rn, 1.0, atol=1e-5)


def test_capability_toggles():
    cfg = tiny_config(mask_on=False, plane_on=False, axis_on=False, depth_on=False)
    rng = jax.random.PRNGKey(1)
    model, variables = init_params(cfg, rng)
    imgs = jnp.zeros((1, 128, 160, 3), jnp.float32)
    out = model.apply(variables, imgs, method=PlaneRCNN.inference)
    det = out["detections"]
    assert det.masks is None and det.planes is None
    assert det.rot_axis is None and "depth" not in out
    # param tree must not contain the disabled heads
    names = set(variables["params"].keys())
    assert "mask_head" not in names and "depth_head" not in names


def test_eval_gt_box_path(tiny_model):
    cfg, model, variables = tiny_model
    imgs = jnp.zeros((1, 128, 160, 3), jnp.float32)
    gt_boxes = jnp.asarray([[[10, 10, 80, 90], [0, 0, 40, 40]]], jnp.float32)
    gt_classes = jnp.asarray([[0, 1]], jnp.int32)
    gt_valid = jnp.asarray([[True, True]])
    out = model.apply(variables, imgs, gt_boxes, gt_classes, gt_valid,
                      method=PlaneRCNN.inference)
    det = out["detections"]
    np.testing.assert_allclose(np.asarray(det.boxes[0, :2]), np.asarray(gt_boxes[0]))
    assert np.asarray(det.valid[0, :2]).all()
    assert det.masks.shape[1] == 2


def test_backbone_feature_shapes(tiny_model):
    cfg, model, variables = tiny_model
    imgs = jnp.zeros((1, 128, 160, 3), jnp.float32)
    feats = model.apply(variables, imgs, method=PlaneRCNN.features)
    assert feats["p2"].shape == (1, 32, 40, 256)
    assert feats["p3"].shape == (1, 16, 20, 256)
    assert feats["p4"].shape == (1, 8, 10, 256)
    assert feats["p5"].shape == (1, 4, 5, 256)
    assert feats["p6"].shape == (1, 2, 3, 256)


def test_frozen_bn_stops_stats_grads(tiny_model):
    """FrozenBN params receive gradients only through folded scale/bias; the
    freeze_at=2 stop_gradient zeroes stem/res2 grads entirely."""
    cfg, model, variables = tiny_model
    imgs = jnp.ones((1, 128, 160, 3), jnp.float32)

    def loss_fn(params):
        feats = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                            imgs, method=PlaneRCNN.features)
        return sum(jnp.sum(f) for f in feats.values())

    grads = jax.grad(loss_fn)(variables["params"])
    stem_grad = grads["backbone"]["stem"]["conv"]["kernel"]
    assert float(jnp.abs(stem_grad).max()) == 0.0
    res2_grad = grads["backbone"]["res2_0"]["conv1"]["conv"]["kernel"]
    assert float(jnp.abs(res2_grad).max()) == 0.0
    res3_grad = grads["backbone"]["res3_0"]["conv1"]["conv"]["kernel"]
    assert float(jnp.abs(res3_grad).max()) > 0.0


def test_param_count_resnet50():
    """R50 backbone parameter count must match torchvision/d2 R50 (25.5M)."""
    cfg = tiny_config()
    from articulation3d_tpu.models.resnet import ResNet
    m = ResNet(ResNetConfig())
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    total = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(v))
    # conv params + BN affine+stats; torch R50 (no fc): 23,454,912 conv/bn
    # weights + running stats for 53 BN layers
    conv = sum(np.prod(p.shape) for path, p in
               jax.tree_util.tree_flatten_with_path(v)[0]
               if "conv" in str(path[-2]))
    assert conv == 23_454_912, conv


def test_drpn_head_variant_and_port():
    """DRPN: 5-conv RPN head (reference drpn.py:13-28) builds, ports, runs."""
    import jax
    import jax.numpy as jnp
    from articulation3d_tpu.config import AnchorConfig, RPNConfig
    from articulation3d_tpu.models.rpn import RPN
    from articulation3d_tpu.train.checkpoint import (_map_name,
                                                     port_detectron2_state_dict)

    cfg = RPNConfig(head_convs=5, pre_nms_topk_test=16, post_nms_topk_test=16)
    rpn = RPN(cfg, AnchorConfig())
    feats = {f"p{i}": jnp.zeros((1, h, w, 256), jnp.float32)
             for i, (h, w) in zip(range(2, 7),
                                  [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)])}
    v = rpn.init(jax.random.PRNGKey(0), feats, image_height=64, image_width=80)
    assert {"conv_0", "conv_4"} <= set(v["params"]["head"])

    assert _map_name("proposal_generator.rpn_head.conv.3.weight") == (
        ("rpn", "head", "conv_3", "kernel"), "conv")
    rs = np.random.RandomState(0)
    sd = {}
    for i in range(5):
        sd[f"proposal_generator.rpn_head.conv.{i}.weight"] = \
            rs.randn(256, 256, 3, 3).astype(np.float32)
        sd[f"proposal_generator.rpn_head.conv.{i}.bias"] = \
            rs.randn(256).astype(np.float32)
    _, _, stats = port_detectron2_state_dict(sd, {"rpn": v["params"]})
    assert stats == {"loaded": 10, "skipped": 0, "unmapped": 0}

    out, _ = rpn.apply(v, feats, image_height=64, image_width=80)
    assert out["boxes"].shape == (1, 16, 4)


def test_space_to_depth_stem_exact():
    """The s2d stem (4x4/s1 conv on 2x2-regrouped pixels) is numerically
    equivalent to the direct 7x7/s2 stem conv, with an IDENTICAL param tree
    (same `stem/conv/kernel` (7,7,3,64) leaf -> checkpoints port 1:1)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from articulation3d_tpu.config import ResNetConfig
    from articulation3d_tpu.models.resnet import ResNet

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 64, 96, 3), jnp.float32)

    direct = ResNet(ResNetConfig(space_to_depth_stem=False))
    s2d = ResNet(ResNetConfig(space_to_depth_stem=True))
    variables = direct.init(jax.random.PRNGKey(0), x)

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    flat2 = jax.tree_util.tree_flatten_with_path(v2)[0]
    assert [p for p, _ in flat] == [p for p, _ in flat2]
    assert variables["params"]["stem"]["conv"]["kernel"].shape == (7, 7, 3, 64)

    out_d = direct.apply(variables, x)
    out_s = s2d.apply(variables, x)
    for k in out_d:
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_d[k]),
                                   rtol=1e-4, atol=1e-4)


def test_upsample2x_stencil_matches_resize():
    """The depth decoder's fused 2x bilinear stencil is bit-level equivalent
    to jax.image.resize(..., 'linear', antialias=False) — the torch
    F.interpolate semantics the golden tests pin (depth_head.py)."""
    from articulation3d_tpu.models.depth_head import _upsample2x_bilinear

    rs = np.random.RandomState(0)
    for shape in [(2, 5, 7, 3), (1, 15, 20, 1), (2, 30, 40, 2)]:
        x = jnp.asarray(rs.randn(*shape), jnp.float32)
        ref = jax.image.resize(x, (shape[0], 2 * shape[1], 2 * shape[2],
                                   shape[3]), "linear", antialias=False)
        got = _upsample2x_bilinear(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
