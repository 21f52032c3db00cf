"""Whole-model parity: plain-torch reference oracle vs the jax stack.

VERDICT r1 "Next round #2": layer-level port tests prove each layer family;
this proves the COMPOSITION — one synthetic d2-schema state dict loads into
two independent forward implementations (tests/torch_oracle.py in torch,
articulation3d_tpu in jax) and the end-to-end outputs must agree:
FPN features, RPN proposals, final detections, masks, planes, axes, depth.

Reference behavior being pinned: the eval path of
`/root/reference/articulation3d/articulation3d/modeling/meta_arch/planercnn.py:125-184`
and `modeling/roi_heads/roi_heads.py:119-165`.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from articulation3d_tpu.config import (Config, DepthHeadConfig,  # noqa: E402
                                       InputConfig, ModelConfig,
                                       ROIHeadsConfig, RPNConfig)
from articulation3d_tpu.evaluation.goldens import (full_d2_key_shapes,  # noqa: E402
                                                   run_probe)
from articulation3d_tpu.models.planercnn import init_params  # noqa: E402
from articulation3d_tpu.train.checkpoint import port_detectron2_state_dict  # noqa: E402

from torch_oracle import PlaneRCNNOracle, he_state_dict, preprocess  # noqa: E402

# slow tier: whole-model compile + torch oracle forward (~5 min)
pytestmark = pytest.mark.slow

H, W = 64, 96
TOPK = 64
DETS = 8
SCORE_THRESH = 0.05


def _jax_config():
    model = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=TOPK, post_nms_topk_test=TOPK,
                      pre_nms_topk_train=TOPK, post_nms_topk_train=TOPK),
        roi_heads=ROIHeadsConfig(detections_per_image=DETS,
                                 batch_size_per_image=DETS,
                                 score_thresh_test=SCORE_THRESH),
        depth_head=DepthHeadConfig(output_height=H, output_width=W),
        dtype="float32", roi_pooler_impl="xla",
    )
    return Config(model=model, input=InputConfig(height=H, width=W))


def _atol(ref, scale=2e-4):
    return scale * (1.0 + float(np.abs(ref).max()))


@pytest.fixture(scope="module")
def parity():
    state_dict = he_state_dict()
    oracle = PlaneRCNNOracle(pre_nms_topk=TOPK, post_nms_topk=TOPK,
                             score_thresh=SCORE_THRESH,
                             detections_per_image=DETS, depth_hw=(H, W))
    torch_sd = {k: torch.from_numpy(v) for k, v in state_dict.items()}
    missing, unexpected = oracle.load_state_dict(torch_sd, strict=False)
    # oracle has no anchor-generator buffers (constants); nothing else may slip
    assert all("anchor_generator" in k for k in unexpected), unexpected
    assert not missing, missing

    cfg = _jax_config()
    _, variables = init_params(cfg, jax.random.PRNGKey(0))
    params, batch_stats, stats = port_detectron2_state_dict(
        state_dict, variables["params"], variables.get("batch_stats", {}))
    assert stats["unmapped"] == 0 and stats["skipped"] == 0
    variables = {"params": params, "batch_stats": batch_stats}

    rs = np.random.RandomState(7)
    image = rs.randint(0, 255, (H, W, 3)).astype(np.uint8)
    t_out = oracle(preprocess(image))
    j_out = run_probe(cfg, variables, image)
    return t_out, j_out


def test_oracle_state_dict_schema_is_complete(parity):
    """Every d2 key the oracle exports must be in the released schema."""
    oracle_keys = set(PlaneRCNNOracle(depth_hw=(H, W)).state_dict().keys())
    schema = set(full_d2_key_shapes().keys())
    assert oracle_keys <= schema, sorted(oracle_keys - schema)[:5]
    missing = {k for k in schema - oracle_keys if "anchor_generator" not in k}
    assert not missing, sorted(missing)[:5]


def test_fpn_features_match(parity):
    t_out, j_out = parity
    for k in ("p2", "p3", "p4", "p5", "p6"):
        ref = t_out["features"][k][0]                       # (C, H, W)
        ours = j_out["features"][k][0].transpose(2, 0, 1)
        assert ref.shape == ours.shape, (k, ref.shape, ours.shape)
        np.testing.assert_allclose(ours, ref, atol=_atol(ref),
                                   err_msg=f"feature {k}")


def test_rpn_proposals_match(parity):
    t_out, j_out = parity
    ref_boxes, ref_scores = t_out["proposal_boxes"], t_out["proposal_scores"]
    valid = j_out["proposal_valid"][0]
    ours_boxes = j_out["proposal_boxes"][0][valid]
    ours_scores = j_out["proposal_logits"][0][valid]
    n = min(10, len(ref_boxes), len(ours_boxes))
    assert n >= 5, (len(ref_boxes), len(ours_boxes))
    np.testing.assert_allclose(ours_boxes[:n], ref_boxes[:n],
                               atol=_atol(ref_boxes[:n], 1e-3))
    np.testing.assert_allclose(ours_scores[:n], ref_scores[:n], atol=1e-3)


def test_detections_match(parity):
    t_out, j_out = parity
    det = j_out["detections"]
    valid = det.valid[0]
    n_ours = int(valid.sum())
    n_ref = len(t_out["boxes"])
    assert n_ours == min(n_ref, DETS), (n_ours, n_ref)
    n = n_ours
    assert n >= 1, "oracle produced no detections; tune the synthetic init"
    np.testing.assert_allclose(det.boxes[0][:n], t_out["boxes"][:n],
                               atol=_atol(t_out["boxes"][:n], 1e-3))
    np.testing.assert_allclose(det.scores[0][:n], t_out["scores"][:n],
                               atol=1e-4)
    np.testing.assert_array_equal(det.classes[0][:n], t_out["classes"][:n])


def test_head_outputs_match(parity):
    t_out, j_out = parity
    det = j_out["detections"]
    n = int(det.valid[0].sum())
    # 2e-3 on sigmoid probabilities: conv-order float noise through the
    # 50-layer trunk reaches ~1e-3 on a handful of pixels
    np.testing.assert_allclose(det.masks[0][:n], t_out["masks"][:n],
                               atol=2e-3, err_msg="mask probabilities")
    np.testing.assert_allclose(det.planes[0][:n], t_out["planes"][:n],
                               atol=5e-4, err_msg="plane params")
    # axis tolerances are scale-aware: the offset column is unbounded
    # (O(100) under this init) and the (sin,cos) normalization amplifies
    # noise when the raw pair has a small norm
    np.testing.assert_allclose(det.rot_axis[0][:n], t_out["rot_axis"][:n],
                               atol=max(5e-3, _atol(t_out["rot_axis"][:n], 5e-5)),
                               err_msg="rot axis")
    np.testing.assert_allclose(det.tran_axis[0][:n], t_out["tran_axis"][:n],
                               atol=5e-3, err_msg="tran axis")


def test_depth_matches(parity):
    t_out, j_out = parity
    ref = t_out["depth"]
    ours = j_out["depth"][0]
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=_atol(ref), err_msg="depth")
