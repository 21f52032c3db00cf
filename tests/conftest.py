"""Test configuration: force CPU backend with 8 virtual devices.

Tests never require real TPU hardware: multi-chip sharding paths are
exercised on a virtual 8-device CPU mesh via
`--xla_force_host_platform_device_count=8` (see SURVEY.md §4).
Must run before the first `import jax`.
"""

import os
import sys

# force CPU: the global environment pins JAX_PLATFORMS=axon (real TPU) which
# must never be used for tests (slow remote compiles, single chip)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# repo root on sys.path so `import articulation3d_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
