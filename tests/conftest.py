"""Test configuration: force CPU backend with 8 virtual devices.

Tests never require real TPU hardware: multi-chip sharding paths are
exercised on a virtual 8-device CPU mesh via
`--xla_force_host_platform_device_count=8` (see SURVEY.md §4).
Must run before the first `import jax`.
"""

import os
import sys

# force CPU: the global environment pins JAX_PLATFORMS=axon (real TPU) which
# must never be used for tests (slow remote compiles, single chip).  The env
# var alone is NOT enough — the axon sitecustomize registers its PJRT plugin
# at interpreter startup and overrides the platform choice, so we must also
# set the config knob before first device use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU collectives ABORT the process when device threads miss a
# rendezvous by 40s (rendezvous.cc termination timeout); on a single-core
# host the mesh tests' device threads serialize, so raise the timeouts
if "collective" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
              " --xla_cpu_collective_timeout_seconds=3000")
os.environ["XLA_FLAGS"] = flags.strip()

# repo root on sys.path so `import articulation3d_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# CPU-only cache dir: the shared .jax_cache also holds XLA:CPU executables
# AOT-compiled by the axon remote helper on a host with a richer CPU feature
# set (AMX, ...) — loading those in a local CPU process can SIGILL/abort
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
