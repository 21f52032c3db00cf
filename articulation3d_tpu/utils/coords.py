"""The ScanNet<->SunCG plane-coordinate convention, centralized.

The reference scatters the same in-place swap across every 3D boundary
(`utils/arti_vis.py:130-131`, `utils/opt_utils.py:403-405`,
`evaluation/arti_evaluation.py:339-341`, `utils/vis.py:140-142`):

    plane[:, [1, 2]] = plane[:, [2, 1]];  plane[:, 1] *= -1

i.e. stored (SunCG-style) plane params (a, b, c) become camera-space
(a, -c, b); the inverse, applied when writing normals back
(`opt_utils.py:624-626`), is (a, b, c) -> (a, c, -b).  SURVEY.md §7.4:
centralize but keep numerics identical — this module is the single home.
"""

from __future__ import annotations

import numpy as np


def plane_to_camera(plane):
    """Stored plane params -> camera space: (a, b, c) -> (a, -c, b).

    Works on (..., 3) numpy or jax arrays.
    """
    a, b, c = plane[..., 0], plane[..., 1], plane[..., 2]
    if isinstance(plane, np.ndarray):
        return np.stack([a, -c, b], axis=-1)
    import jax.numpy as jnp
    return jnp.stack([a, -c, b], axis=-1)


def camera_to_plane(n):
    """Camera-space normal -> stored convention: (a, b, c) -> (a, c, -b)."""
    a, b, c = n[..., 0], n[..., 1], n[..., 2]
    if isinstance(n, np.ndarray):
        return np.stack([a, c, -b], axis=-1)
    import jax.numpy as jnp
    return jnp.stack([a, c, -b], axis=-1)
