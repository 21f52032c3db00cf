"""Weight-porter golden tests: torch modules vs ported flax modules.

Builds small torch (CPU) equivalents of each layer family, exports
d2-style state-dict keys, ports them through `port_detectron2_state_dict`,
and checks the flax forward matches torch to float32 tolerance.  This
validates every layout conversion (conv/deconv/linear transposes, NCHW vs
NHWC flatten order, BN folding) that the real `model_final.pth` port relies
on.
"""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from articulation3d_tpu.train.checkpoint import (  # noqa: E402
    _convert, _fc_reorder, _map_name, port_detectron2_state_dict)


def to_np(t):
    return t.detach().cpu().numpy()


def test_map_name_coverage():
    cases = {
        "backbone.bottom_up.stem.conv1.weight": ("backbone", "stem", "conv", "kernel"),
        "backbone.bottom_up.stem.conv1.norm.running_mean":
            ("backbone", "stem", "norm", "running_mean"),
        "backbone.bottom_up.res2.0.shortcut.weight":
            ("backbone", "res2_0", "shortcut", "conv", "kernel"),
        "backbone.bottom_up.res5.2.conv3.norm.weight":
            ("backbone", "res5_2", "conv3", "norm", "weight"),
        "backbone.fpn_lateral2.weight": ("fpn", "lateral_res2", "kernel"),
        "backbone.fpn_output5.bias": ("fpn", "output_p5", "bias"),
        "proposal_generator.rpn_head.conv.weight": ("rpn", "head", "conv", "kernel"),
        "roi_heads.box_head.fc1.weight": ("box_head", "fc1", "kernel"),
        "roi_heads.box_predictor.cls_score.bias": ("box_head", "cls_score", "bias"),
        "roi_heads.mask_head.deconv.weight": ("mask_head", "deconv", "kernel"),
        "roi_heads.plane_head.plane_conv2.weight":
            ("plane_head", "tower", "plane_conv2", "kernel"),
        "roi_heads.plane_head.param_pred.weight":
            ("plane_head", "param_pred", "kernel"),
        "roi_heads.axis_head.axis_R_fc1.weight":
            ("axis_head", "tower_R", "axis_R_fc1", "kernel"),
        "roi_heads.axis_head.rotation.weight": ("axis_head", "rotation", "kernel"),
        "depth_head.conv3.0.weight": ("depth_head", "conv3", "conv", "kernel"),
        "depth_head.deconv5.1.weight": ("depth_head", "deconv5_conv", "kernel"),
        "depth_head.deconv2.2.running_var": ("depth_head", "deconv2_bn", "running_var"),
        "depth_head.depth_pred.bias": ("depth_head", "depth_pred", "bias"),
    }
    for key, path in cases.items():
        mapped = _map_name(key)
        assert mapped is not None, key
        assert mapped[0] == path, (key, mapped[0])


def test_conv_transpose_layout():
    """nn.Conv with ported torch Conv2d weights reproduces torch."""
    rs = np.random.RandomState(0)
    tconv = tnn.Conv2d(3, 5, 3, padding=1)
    x = rs.randn(2, 3, 8, 8).astype(np.float32)
    ref = to_np(tconv(torch.from_numpy(x)))

    from flax import linen as nn
    m = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)])
    kernel = _convert(to_np(tconv.weight), "conv", ())
    out = m.apply({"params": {"kernel": kernel, "bias": to_np(tconv.bias)}},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_deconv_layout():
    """flax ConvTranspose with ported torch ConvTranspose2d weights."""
    rs = np.random.RandomState(1)
    tdeconv = tnn.ConvTranspose2d(4, 6, 2, stride=2)
    x = rs.randn(2, 4, 7, 7).astype(np.float32)
    ref = to_np(tdeconv(torch.from_numpy(x)))

    from flax import linen as nn
    m = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
    kernel = _convert(to_np(tdeconv.weight), "deconv", ())
    out = m.apply({"params": {"kernel": kernel, "bias": to_np(tdeconv.bias)}},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_fc_flatten_order():
    """First FC after conv: torch NCHW flatten vs our NHWC flatten."""
    rs = np.random.RandomState(2)
    h = w = 4
    c = 6
    fc = tnn.Linear(c * h * w, 10)
    x = rs.randn(3, c, h, w).astype(np.float32)
    ref = to_np(fc(torch.from_numpy(x).flatten(1)))

    kernel = _fc_reorder(to_np(fc.weight), h, w, c)
    x_nhwc = x.transpose(0, 2, 3, 1).reshape(3, -1)
    out = x_nhwc @ kernel + to_np(fc.bias)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_frozen_bn_port():
    """FrozenBatchNorm with ported running stats == torch BN eval."""
    from articulation3d_tpu.models.resnet import FrozenBatchNorm
    rs = np.random.RandomState(3)
    bn = tnn.BatchNorm2d(5, eps=1e-5)
    bn.weight.data = torch.from_numpy(rs.rand(5).astype(np.float32) + 0.5)
    bn.bias.data = torch.from_numpy(rs.randn(5).astype(np.float32))
    bn.running_mean.data = torch.from_numpy(rs.randn(5).astype(np.float32))
    bn.running_var.data = torch.from_numpy(rs.rand(5).astype(np.float32) + 0.5)
    bn.eval()
    x = rs.randn(2, 5, 6, 6).astype(np.float32)
    ref = to_np(bn(torch.from_numpy(x)))

    m = FrozenBatchNorm(5)
    params = {"weight": to_np(bn.weight), "bias": to_np(bn.bias),
              "running_mean": to_np(bn.running_mean),
              "running_var": to_np(bn.running_var)}
    out = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_mask_head_end_to_end_port():
    """Full torch mask head -> state dict -> ported flax MaskHead."""
    from articulation3d_tpu.config import MaskHeadConfig
    from articulation3d_tpu.models.heads import MaskHead

    class TorchMaskHead(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mask_fcn1 = tnn.Conv2d(8, 8, 3, padding=1)
            self.mask_fcn2 = tnn.Conv2d(8, 8, 3, padding=1)
            self.deconv = tnn.ConvTranspose2d(8, 8, 2, stride=2)
            self.predictor = tnn.Conv2d(8, 1, 1)

        def forward(self, x):
            x = tF.relu(self.mask_fcn1(x))
            x = tF.relu(self.mask_fcn2(x))
            x = tF.relu(self.deconv(x))
            return self.predictor(x)

    tm = TorchMaskHead()
    rs = np.random.RandomState(4)
    x = rs.randn(3, 8, 7, 7).astype(np.float32)
    ref = to_np(tm(torch.from_numpy(x)))

    state_dict = {f"roi_heads.mask_head.{k}": to_np(v)
                  for k, v in tm.state_dict().items()}
    cfg = MaskHeadConfig(num_conv=2, conv_dim=8)
    m = MaskHead(cfg)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 7, 7, 8), jnp.float32))
    params, _, stats = port_detectron2_state_dict(state_dict,
                                                  {"mask_head": variables["params"]})
    assert stats["loaded"] == 8 and stats["skipped"] == 0
    out = m.apply({"params": params["mask_head"]},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref[:, 0], atol=1e-5)


def test_depth_bn_port():
    """flax BatchNorm (running-average mode) with ported torch BN."""
    from flax import linen as nn
    bn = tnn.BatchNorm2d(4, eps=1e-3)
    rs = np.random.RandomState(5)
    bn.running_mean.data = torch.from_numpy(rs.randn(4).astype(np.float32))
    bn.running_var.data = torch.from_numpy(rs.rand(4).astype(np.float32) + 0.5)
    bn.weight.data = torch.from_numpy(rs.rand(4).astype(np.float32) + 0.5)
    bn.bias.data = torch.from_numpy(rs.randn(4).astype(np.float32))
    bn.eval()
    x = rs.randn(2, 4, 5, 5).astype(np.float32)
    ref = to_np(bn(torch.from_numpy(x)))

    m = nn.BatchNorm(use_running_average=True, epsilon=1e-3)
    variables = {
        "params": {"scale": to_np(bn.weight), "bias": to_np(bn.bias)},
        "batch_stats": {"mean": to_np(bn.running_mean),
                        "var": to_np(bn.running_var)},
    }
    out = m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_load_weights_cross_stage_warm_start(tmp_path):
    """Orbax warm start is weights-only and shape-tolerant (the d2
    `DetectionCheckpointer` cross-stage contract, reference
    `tools/train_net.py:89-103`): matching keys load, new heads keep fresh
    init, dropped keys are ignored, step/opt_state are not restored."""
    import collections

    from articulation3d_tpu.train.checkpoint import (load_weights,
                                                     save_checkpoint)

    TS = collections.namedtuple("TS", "step params batch_stats opt_state")
    old = TS(step=np.int32(7),
             params={"backbone": {"w": np.ones((2, 2), np.float32)},
                     "box_head": {"w": np.full((3,), 2.0, np.float32)},
                     "dropped": {"w": np.zeros((1,), np.float32)}},
             batch_stats={"backbone": {"mean": np.full((4,), 5.0, np.float32)}},
             opt_state={"momentum": np.zeros((2, 2), np.float32)})
    path = save_checkpoint(str(tmp_path), old, 7)

    new = TS(step=np.int32(0),
             params={"backbone": {"w": np.zeros((2, 2), np.float32)},
                     # same key, NEW shape: must keep the fresh value
                     "box_head": {"w": np.full((5,), -1.0, np.float32)},
                     # stage-2-style new head: must keep fresh init
                     "axis_head": {"w": np.full((2,), 9.0, np.float32)}},
             batch_stats={"backbone": {"mean": np.zeros((4,), np.float32)}},
             opt_state={"different": np.zeros((1,), np.float32)})
    params, batch_stats, stats = load_weights(path, new)

    np.testing.assert_array_equal(params["backbone"]["w"], 1.0)
    np.testing.assert_array_equal(params["axis_head"]["w"], 9.0)
    np.testing.assert_array_equal(params["box_head"]["w"], -1.0)
    np.testing.assert_array_equal(batch_stats["backbone"]["mean"], 5.0)
    assert stats["loaded"] == 2
    assert stats["missing"] == ["params.axis_head.w"]
    assert stats["unexpected"] == ["params.dropped.w"]
    assert stats["shape_mismatch"] == ["params.box_head.w"]

def test_load_checkpoint_relative_path(tmp_path, monkeypatch):
    """Resume must accept a RELATIVE checkpoint path (the soak run's
    `--resume` crashed: orbax/tensorstore rejects relative paths at restore
    time while save_checkpoint absolutizes, so a relative `output_dir`
    saved fine and then failed to resume)."""
    import collections

    from articulation3d_tpu.train.checkpoint import (latest_checkpoint,
                                                     load_checkpoint,
                                                     save_checkpoint)

    TS = collections.namedtuple("TS", "step params batch_stats opt_state")
    st = TS(step=np.int32(3),
            params={"w": np.full((2, 2), 4.0, np.float32)},
            batch_stats={}, opt_state={})
    monkeypatch.chdir(tmp_path)
    save_checkpoint("out", st, 3)
    rel = latest_checkpoint("out")
    assert not os.path.isabs(rel) or rel.startswith(str(tmp_path))
    restored = load_checkpoint(os.path.relpath(rel), st)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(restored.params["w"], 4.0)
