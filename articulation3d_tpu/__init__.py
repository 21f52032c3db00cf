"""articulation3d_tpu — TPU-native rebuild of Articulation3D (CVPR 2022).

A JAX/XLA/Pallas framework with the capabilities of
github.com/JasonQSY/Articulation3D: per-frame detection of articulating
planar objects (rotation/translation class, box, mask, 3D plane, 2D axis),
monocular depth, temporal articulation-model optimization over video, and
textured mesh export — redesigned for TPU: fixed-shape jitted pipelines,
frames as the data-parallel batch axis over a `jax.sharding.Mesh`, and
vectorized (vmapped) temporal optimization.
"""

__version__ = "0.1.0"

from . import config as config  # noqa: F401
from .config import Config, load_config, inference_config  # noqa: F401
