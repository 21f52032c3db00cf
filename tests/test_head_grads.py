"""Gradient-safety regression tests for the normalized regression heads.

`v / max(||v||, eps)` is forward-correct at v == 0 but its VJP is NaN there
(d||v||/dv = 0/0), and all-zero tower outputs DO occur in training: an
all-negative image contributes a zero GT box to `sample_rois`' appended
proposals, the degenerate ROI pools all-zero features, and the ReLU towers
output exactly 0.  One such row used to poison the ENTIRE plane/axis head
gradient tree with NaN (found by tests/test_recipe.py: plane_head params
"never moved" — they were NaN).  `models/heads.py:safe_unit` is the fix.
"""

import numpy as np
import jax
import jax.numpy as jnp

from articulation3d_tpu.config import AxisHeadConfig, PlaneHeadConfig
from articulation3d_tpu.models.heads import AxisHead, PlaneHead, safe_unit


def _no_nan(tree):
    return all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(tree))


def test_safe_unit_forward_and_grad():
    v = jnp.asarray([[3.0, 4.0], [0.0, 0.0], [-1e-20, 0.0]])
    out = safe_unit(v)
    np.testing.assert_allclose(np.asarray(out[0]), [0.6, 0.8], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out[1]), [0.0, 0.0])

    g = jax.grad(lambda x: jnp.sum(safe_unit(x) * jnp.asarray([0.0, 1.0])))(v)
    assert _no_nan(g)
    # nonzero rows keep the plain quotient-rule gradient
    gref = jax.grad(lambda x: jnp.sum(
        (x / jnp.linalg.norm(x, axis=-1, keepdims=True))
        * jnp.asarray([0.0, 1.0])))(v[:1])
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gref[0]), atol=1e-6)
    # the zero row contributes zero gradient, not NaN
    np.testing.assert_array_equal(np.asarray(g[1]), [0.0, 0.0])


def test_plane_axis_heads_zero_row_grads_finite():
    """A batch mixing real and ALL-ZERO pooled features (the degenerate-ROI
    case) must yield finite parameter gradients for both heads."""
    rs = np.random.RandomState(0)
    x = rs.randn(3, 14, 14, 32).astype(np.float32)
    x[1] = 0.0                                   # the poisoned row
    x = jnp.asarray(x)

    ph = PlaneHead(PlaneHeadConfig(num_conv=1, conv_dim=16, num_fc=1,
                                   fc_dim=16, normal_only=True))
    pv = ph.init(jax.random.PRNGKey(0), x)

    def plane_loss(params):
        p = ph.apply(params, x)
        return jnp.sum(jnp.abs(p - jnp.asarray([0.0, 0.0, 1.0])))

    g = jax.grad(plane_loss)(pv)
    assert _no_nan(g), "PlaneHead gradient has NaN on a zero-feature row"
    # and the head still learns: gradients are not identically zero
    assert max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g)) > 0.0

    ah = AxisHead(AxisHeadConfig(num_conv=1, conv_dim=16, num_fc=1, fc_dim=16))
    av = ah.init(jax.random.PRNGKey(1), x)

    def axis_loss(params):
        rot, tran = ah.apply(params, x)
        return jnp.sum(jnp.abs(rot)) + jnp.sum(jnp.abs(tran))

    g = jax.grad(axis_loss)(av)
    assert _no_nan(g), "AxisHead gradient has NaN on a zero-feature row"
