"""Whole-model parity harness validation (no real weights needed).

1. A synthetically-initialized FULL d2-schema state dict (every key the
   shipped `model_final.pth` carries) ports with zero unmapped / zero
   skipped keys and actually overwrites every mapped parameter.
2. The goldens fixture + compare runner round-trips: goldens produced from
   our own model compare to ~zero error against the same model (validates
   the fixture format, the probe, and the matching logic).
"""

import dataclasses

import numpy as np
import pytest

import jax

from articulation3d_tpu.config import (Config, DepthHeadConfig, InputConfig,
                                       ModelConfig, ROIHeadsConfig, RPNConfig)
from articulation3d_tpu.evaluation.goldens import (compare_goldens,
                                                   full_d2_key_shapes,
                                                   load_goldens,
                                                   match_detections,
                                                   run_probe, save_goldens)
from articulation3d_tpu.models.planercnn import init_params
from articulation3d_tpu.train.checkpoint import port_detectron2_state_dict

# slow tier: full-schema weight port + whole-model compile
pytestmark = pytest.mark.slow

H, W = 64, 80


def _tiny_cfg():
    model = ModelConfig(
        rpn=RPNConfig(pre_nms_topk_test=32, post_nms_topk_test=32,
                      pre_nms_topk_train=32, post_nms_topk_train=32),
        roi_heads=ROIHeadsConfig(detections_per_image=8,
                                 batch_size_per_image=8,
                                 score_thresh_test=0.0),
        depth_head=DepthHeadConfig(output_height=H, output_width=W),
        dtype="float32", roi_pooler_impl="xla",
    )
    return Config(model=model, input=InputConfig(height=H, width=W))


def test_full_schema_state_dict_ports_completely():
    """Every key of the released checkpoint schema must map and load."""
    shapes = full_d2_key_shapes()
    rs = np.random.RandomState(0)
    state_dict = {k: np.asarray(rs.randn(*s), np.float32) * 0.05
                  for k, s in shapes.items()}
    # make BN variances positive
    for k in state_dict:
        if k.endswith("running_var"):
            state_dict[k] = np.abs(state_dict[k]) + 0.5

    cfg = _tiny_cfg()
    _, variables = init_params(cfg, jax.random.PRNGKey(0))
    before = jax.tree_util.tree_map(np.asarray, variables["params"])

    params, batch_stats, stats = port_detectron2_state_dict(
        state_dict, variables["params"], variables.get("batch_stats", {}))

    ignorable = sum(1 for k in shapes
                    if k.endswith("num_batches_tracked")
                    or ".anchor_generator." in k)
    expected = len(shapes) - ignorable
    assert stats["unmapped"] == 0, "schema keys the porter cannot map"
    assert stats["skipped"] == 0, "schema keys with shape mismatches"
    assert stats["loaded"] == expected, (stats, expected)

    # spot-check that ported leaves actually changed
    for path in (("backbone", "res5_2", "conv3", "conv", "kernel"),
                 ("box_head", "fc1", "kernel"),
                 ("axis_head", "tower_T", "axis_T_fc1", "kernel"),
                 ("depth_head", "deconv5_conv", "kernel")):
        a = before
        b = params
        for p in path:
            a, b = a[p], b[p]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0, path


def test_goldens_self_consistency(tmp_path):
    """Goldens produced by our model compare to ~zero error vs itself."""
    cfg = _tiny_cfg()
    _, variables = init_params(cfg, jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (H, W, 3)).astype(np.uint8)

    probe = run_probe(cfg, variables, img)
    dets = probe["detections"]
    keep = dets.valid[0]
    goldens = {"image": img}
    for k, v in probe["features"].items():
        goldens[k] = v[0].transpose(2, 0, 1)
    pvalid = probe["proposal_valid"][0]
    goldens["proposal_boxes"] = probe["proposal_boxes"][0][pvalid]
    goldens["proposal_logits"] = probe["proposal_logits"][0][pvalid]
    goldens["det_boxes"] = dets.boxes[0][keep]
    goldens["det_scores"] = dets.scores[0][keep]
    goldens["det_classes"] = dets.classes[0][keep]
    goldens["pred_masks"] = dets.masks[0][keep]
    goldens["pred_planes"] = dets.planes[0][keep]
    goldens["pred_rot_axis"] = dets.rot_axis[0][keep]
    goldens["pred_tran_axis"] = dets.tran_axis[0][keep]
    goldens["depth"] = probe["depth"][0]

    path = str(tmp_path / "golden.npz")
    save_goldens(path, goldens)
    report = compare_goldens(load_goldens(path), cfg, variables,
                             score_thresh=0.0)

    for k in ("feat_p2_max_err", "feat_p6_max_err", "depth_max_err"):
        assert report[k] < 1e-5, (k, report[k])
    assert report["det_match_frac"] == 1.0
    assert report["det_box_max_err"] < 1e-4
    for k in ("masks_max_err", "planes_max_err", "rot_axis_max_err",
              "tran_axis_max_err"):
        assert report[k] < 1e-5, (k, report[k])


@pytest.mark.parametrize("fixture_name,min_dets,box_tol,head_tol,match_min", [
    ("golden_oracle_64x96.npz", 1, 0.05, 0.05, 1.0),
    # second fixture (VERDICT r3 #7): 128x160, BIASED logits -> golden
    # matching exercised on a non-empty (10+ detections) survivor set.
    # Wider tolerances: the +6 foreground bias puts the box head's
    # activations ~40x higher, so f32 drift through the class-wise delta
    # decode scales with it (measured 0.23px at 128x160), and since
    # mask/plane/axis heads SAMPLE at the detected box, that sub-pixel box
    # shift moves their 14x14 grids and shifts edge probabilities
    # (measured mask delta 0.32 at steep sigmoid edges).  TIGHT numeric
    # parity is pinned by the unbiased fixture; this one pins the
    # non-empty-population path (matcher, NMS survivors, per-class
    # selection at 16 detections).
    ("golden_oracle_biased_128x160.npz", 10, 0.5, 0.5, 1.0),
    # third fixture (VERDICT r4 next #7): PRODUCTION capacity — 480x640,
    # 1000 pre/post-NMS proposals, 100 detections (the caps saturate under
    # the biased load), so golden matching exercises the full-size
    # RPN-topk/NMS/per-class-selection/depth paths CI previously only saw
    # at toy shapes.  Feature maps are omitted from the fixture to keep it
    # committable (~2MB); feature parity stays pinned by the two small
    # fixtures (compare_goldens skips absent keys).
    # match_min 0.9, not 1.0: BOTH capacity caps saturate (100/100), so
    # f32-drift reorderings at the cap boundary swap borderline survivors
    # (the bench's on-chip serving-parity check sees the same adversarial
    # regime: 1905/1920 matched, PROFILE.md)
    ("golden_oracle_biased_480x640.npz", 50, 2.0, 0.75, 0.9),
])
def test_committed_oracle_fixture_via_compare_goldens(tmp_path, fixture_name,
                                                      min_dets, box_tol,
                                                      head_tol, match_min):
    """The producer->consumer harness end to end (VERDICT r2 next #3): a
    COMMITTED oracle-generated fixture (tools/make_goldens_oracle.py) is
    consumed by the real `tools/compare_goldens.py` runner with weights
    regenerated from the fixture's seed and torch.save'd — exercising
    load_torch_state_dict + the full port + probe + matching, exactly the
    command to run when the released model_final.pth becomes available."""
    torch = pytest.importorskip("torch")
    import os
    import sys

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           fixture_name)
    assert os.path.exists(fixture), \
        "regenerate with: python tools/make_goldens_oracle.py"

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from compare_goldens import run_compare
    from torch_oracle import bias_state_dict_for_detections, he_state_dict

    goldens = load_goldens(fixture)
    sd = he_state_dict(int(goldens["meta_weights_seed"]))
    if int(goldens.get("meta_bias", 0)):
        sd = bias_state_dict_for_detections(sd)
    weights = str(tmp_path / "synthetic_d2.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, weights)

    report = run_compare(fixture, weights, pooler="xla", score_thresh=0.05)
    assert report["det_ref_count"] >= min_dets, report

    for k in ("p2", "p3", "p4", "p5", "p6"):
        if f"feat_{k}_max_err" in report:   # 480x640 fixture omits features
            assert report[f"feat_{k}_max_err"] < 0.02, (k, report)
    assert report["proposal_top100_match_frac"] >= 0.9, report
    assert report["det_ref_count"] >= 1, report
    assert report["det_match_frac"] >= match_min, report
    assert report["det_box_max_err"] < box_tol, report
    for k in ("masks_max_err", "planes_max_err"):
        assert report[k] < head_tol, (k, report)
    for k in ("rot_axis_max_err", "tran_axis_max_err"):
        if head_tol <= 0.05:
            assert report[k] < head_tol, (k, report)
        else:
            # biased fixture: the axis towers L2-normalize a near-zero
            # He-init output, so the (sin, cos) DIRECTION is unstable under
            # the 0.23px matched-box shift (measured 0.76 swing) — this
            # fixture deliberately does NOT gate axis direction (a <= 2.0
            # bound would be vacuous: double-angle outputs live in [-1, 1]).
            # Tight axis parity is pinned by the unbiased fixture above
            # (and by the real weights, whose axis outputs are decisively
            # non-zero).  Here only require the comparison ran and stayed
            # finite.
            assert np.isfinite(report[k]), (k, report)
    # the synthetic depth decoder emits O(1e6) values (eval-mode BNs on
    # random running stats): scale-aware bound, as in test_torch_oracle
    depth_scale = 1.0 + float(np.abs(goldens["depth"]).max())
    assert report["depth_max_err"] < 2e-4 * depth_scale, report


def test_match_detections_greedy():
    ref = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    out = np.asarray([[20, 20, 30, 30], [0, 0, 10, 10], [50, 50, 60, 60]],
                     np.float32)
    ri, oi = match_detections(ref, out)
    assert list(ri) == [0, 1] and list(oi) == [1, 0]
