"""Slim-dryrun <-> production-dims structure equivalence (VERDICT r3 #3).

The driver's multichip dryrun (`__graft_entry__._tiny_config`) slims channel
and FC dims so the 8-rank Gloo allreduce payload fits the 660s budget; the
claim that the GREEN dryrun still validates production sharded-training
semantics rests on the slim being STRUCTURE-PRESERVING.  This test pins
that: the slim config and the same config at production (default) dims must
produce

  * identical parameter-tree structure (same flattened key paths),
  * identical freeze-mask sets (same trainable / frozen leaf paths),
  * identical loss-key sets from one `compute_losses` evaluation.

If a future edit slims a module in a way that drops a parameter, freezes a
different subtree, or silences a loss, the driver artifact would go green
while validating the wrong program — this test fails instead.
"""

import dataclasses
import sys
import os

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _production_dims_variant(slim_cfg):
    """The slim config with every capacity dim reset to production defaults.

    Copies ONLY semantics-bearing fields (toggles, freeze list, dtype) and
    the tiny proposal/detection CAPS (wall-time, not structure) from the
    slim config onto default `ModelConfig` dims — so any NEW slim field
    added to `_tiny_config` later is automatically compared against its
    production value rather than silently inherited.
    """
    from articulation3d_tpu.config import ModelConfig

    m = slim_cfg.model
    d = ModelConfig()
    prod_model = dataclasses.replace(
        ModelConfig(
            mask_on=m.mask_on, plane_on=m.plane_on, depth_on=m.depth_on,
            axis_on=m.axis_on, refine_on=m.refine_on, freeze=m.freeze,
            dtype=m.dtype),
        rpn=dataclasses.replace(
            d.rpn, pre_nms_topk_test=m.rpn.pre_nms_topk_test,
            post_nms_topk_test=m.rpn.post_nms_topk_test,
            pre_nms_topk_train=m.rpn.pre_nms_topk_train,
            post_nms_topk_train=m.rpn.post_nms_topk_train),
        roi_heads=dataclasses.replace(
            d.roi_heads,
            detections_per_image=m.roi_heads.detections_per_image,
            batch_size_per_image=m.roi_heads.batch_size_per_image),
        depth_head=dataclasses.replace(
            d.depth_head, output_height=m.depth_head.output_height,
            output_width=m.depth_head.output_width))
    return slim_cfg.replace(model=prod_model)


def _param_paths(params):
    import flax
    return set("/".join(p) for p in flax.traverse_util.flatten_dict(params))


@pytest.mark.slow
def test_slim_dryrun_config_is_structure_preserving():
    from __graft_entry__ import _dryrun_batch, _tiny_config
    from articulation3d_tpu.models import PlaneRCNN, init_params
    from articulation3d_tpu.train.optimizer import freeze_mask
    from articulation3d_tpu.train.train_step import compute_losses

    slim_cfg = _tiny_config(train=True)
    prod_cfg = _production_dims_variant(slim_cfg)
    # sanity: the variant actually restores production dims
    assert prod_cfg.model.fpn.out_channels == 256
    assert prod_cfg.model.box_head.fc_dim == 1024

    batch = jax.tree_util.tree_map(
        lambda x: np.asarray(x), _dryrun_batch(slim_cfg, 2))
    key = jax.random.PRNGKey(1)

    results = {}
    for name, cfg in (("slim", slim_cfg), ("prod", prod_cfg)):
        model, variables = init_params(cfg, jax.random.PRNGKey(0))
        params = variables["params"]
        trainable = freeze_mask(params, cfg.model.freeze)
        import flax
        flat_t = flax.traverse_util.flatten_dict(trainable)
        losses = jax.jit(
            lambda p, bs, b, k, m=model, c=cfg: compute_losses(
                m, p, bs, b, k, c)[0])(
                params, variables.get("batch_stats", {}), batch, key)
        results[name] = {
            "paths": _param_paths(params),
            "trainable": set("/".join(p) for p, v in flat_t.items() if v),
            "frozen": set("/".join(p) for p, v in flat_t.items() if not v),
            "loss_keys": set(losses.keys()),
        }

    slim, prod = results["slim"], results["prod"]
    assert slim["paths"] == prod["paths"], (
        "param tree structure diverged:\n"
        f"only slim: {sorted(slim['paths'] - prod['paths'])[:10]}\n"
        f"only prod: {sorted(prod['paths'] - slim['paths'])[:10]}")
    assert slim["trainable"] == prod["trainable"]
    assert slim["frozen"] == prod["frozen"]
    assert slim["loss_keys"] == prod["loss_keys"], (slim["loss_keys"],
                                                    prod["loss_keys"])
    # the dryrun's advertised loss set (nine losses) stays pinned
    assert slim["loss_keys"] == {
        "loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
        "loss_mask", "loss_plane", "loss_rot_axis", "loss_tran_axis",
        "depth_loss"}
