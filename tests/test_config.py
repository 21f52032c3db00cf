"""Config system tests: linear-scaling rule (SOLVER.REFERENCE_WORLD_SIZE).

Reference ships only the knob (`config/config.yaml:332`); the behavior is
detectron2 `DefaultTrainer.auto_scale_workers`: batch and LR scale with the
worker count, iteration-denominated quantities shrink by the same factor.
"""

import dataclasses

import pytest

from articulation3d_tpu.config import Config, auto_scale_workers


def _cfg(ref_ws):
    cfg = Config()
    solver = dataclasses.replace(
        cfg.solver, reference_world_size=ref_ws, ims_per_batch=16,
        base_lr=1e-3, max_iter=100_000, warmup_iters=1000,
        steps=(210_000, 250_000), checkpoint_period=1000)
    test = dataclasses.replace(cfg.test, eval_period=1000)
    return dataclasses.replace(cfg, solver=solver, test=test)


def test_disabled_when_reference_world_size_zero():
    cfg = _cfg(0)
    assert auto_scale_workers(cfg, 8) is cfg


def test_noop_when_already_at_reference_size():
    cfg = _cfg(8)
    assert auto_scale_workers(cfg, 8) is cfg


def test_scale_up_2x():
    cfg = auto_scale_workers(_cfg(4), 8)
    s = cfg.solver
    assert s.ims_per_batch == 32
    assert s.base_lr == pytest.approx(2e-3)
    assert s.max_iter == 50_000
    assert s.warmup_iters == 500
    assert s.steps == (105_000, 125_000)
    assert s.checkpoint_period == 500
    assert cfg.test.eval_period == 500
    assert s.reference_world_size == 8


def test_scale_down_then_idempotent():
    cfg = auto_scale_workers(_cfg(8), 2)
    s = cfg.solver
    assert s.ims_per_batch == 4
    assert s.base_lr == pytest.approx(2.5e-4)
    assert s.max_iter == 400_000
    assert s.reference_world_size == 2
    # a second application at the same worker count changes nothing
    assert auto_scale_workers(cfg, 2) is cfg


def test_yaml_key_round_trips(tmp_path):
    from articulation3d_tpu.config import load_config
    p = tmp_path / "c.yaml"
    p.write_text("solver:\n  reference_world_size: 16\n")
    cfg = load_config(str(p))
    assert cfg.solver.reference_world_size == 16
