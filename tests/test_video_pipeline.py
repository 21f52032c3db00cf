"""Batched video inference pipeline tests (tiny config, CPU)."""

import numpy as np
import jax
import pytest

from articulation3d_tpu.models import PlaneRCNN, init_params
from articulation3d_tpu.video import VideoPipeline, override_plane_offsets
from tests.test_model import tiny_config

# slow tier: whole-pipeline integration (compiles full inference)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline():
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    model, variables = init_params(cfg, rng)
    return VideoPipeline(cfg, model, variables, batch_size=4,
                         conf_threshold=0.0)


def test_pipeline_runs_and_trims(pipeline):
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (128, 160, 3), np.uint8) for _ in range(6)]
    preds = pipeline.run(frames)
    assert len(preds) == 6          # padding trimmed (6 = 4 + 2)
    for p in preds:
        n = len(p)
        assert p.boxes.shape == (n, 4)
        assert p.masks.shape[0] == n
        if n:
            assert p.masks.shape[1:] == (128, 160)
        assert p.planes.shape == (n, 3)
        assert p.rot_axis.shape == (n, 3)
        assert p.tran_axis.shape == (n, 2)
        assert np.all(np.isfinite(p.boxes))
    assert len(pipeline.depths) == 6
    assert pipeline.depths[0].shape == (128, 160)


def test_pipeline_conf_threshold(pipeline):
    rs = np.random.RandomState(1)
    frames = [rs.randint(0, 255, (128, 160, 3), np.uint8)]
    preds = pipeline.run(frames)
    # raising the threshold can only shrink the detection set
    pipeline.conf_threshold = 1.1
    preds_hi = pipeline.run(frames)
    assert len(preds_hi[0]) <= len(preds[0])
    assert len(preds_hi[0]) == 0  # scores are probabilities <= 1
    pipeline.conf_threshold = 0.0


def test_override_plane_offsets_geometry():
    """Flat z=2 depth with camera normal (0,0,1): offset becomes ~2."""
    import jax.numpy as jnp
    from articulation3d_tpu.utils.camera import get_k_inv_dot_xy_1_eval
    h, w = 48, 64
    rays = jnp.asarray(get_k_inv_dot_xy_1_eval(h, w).reshape(3, h, w),
                       jnp.float32)
    planes = jnp.asarray([[0.0, 1.0, 0.0],    # camera normal (0, 0, 1)
                          [0.0, 5.0, 0.0]])   # same normal, offset 5
    masks = jnp.zeros((2, h, w), bool).at[0, 20:28, 28:36].set(True)
    # instance 1 has an empty mask -> plane kept
    depth = jnp.full((h, w), 2.0)
    out = np.asarray(override_plane_offsets(planes, masks, depth, rays))
    assert np.linalg.norm(out[0]) == pytest.approx(2.0, rel=0.02)
    np.testing.assert_allclose(out[1], [0.0, 5.0, 0.0])


def test_pipeline_output_rescale():
    """detector_postprocess rescale contract (postprocessing.py:11-75):
    boxes scale to the output resolution, masks paste at output size."""
    from articulation3d_tpu.models import init_params

    cfg = tiny_config()
    model, variables = init_params(cfg, jax.random.PRNGKey(0))
    base = VideoPipeline(cfg, model, variables, batch_size=2,
                         conf_threshold=0.0)
    scaled = VideoPipeline(cfg, model, variables, batch_size=2,
                           conf_threshold=0.0,
                           output_height=256, output_width=320)
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (128, 160, 3), np.uint8)]
    p0 = base.run(frames)[0]
    p1 = scaled.run(frames)[0]
    assert len(p0) == len(p1)
    if len(p0):
        np.testing.assert_allclose(p1.boxes, p0.boxes * 2.0, atol=1e-3)
        assert p1.masks.shape[1:] == (256, 320)
        assert np.all(p1.boxes[:, 0::2] <= 320 + 1e-3)
        assert np.all(p1.boxes[:, 1::2] <= 256 + 1e-3)
