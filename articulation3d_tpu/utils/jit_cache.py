"""Persistent XLA compilation cache, shared by every CLI entry point.

The reference has no compile step at all (eager torch); here every program
shape pays a one-time XLA compile that the dev-tunnel environment measures
in MINUTES (PROFILE.md: ~16 min to first train iter, 117-375 s first
inference chunk).  JAX's persistent compilation cache amortizes that to a
disk read for every later process — re-runs, `--resume` after a kill, the
second clip through `tools/inference.py`.  The drive tools under `tools/`
enabled this individually; `enable_persistent_cache()` is the one shared
knob (called by the inference/train/opt CLIs before any jit).
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    Default location: `<repo root>/.jax_cache` (overridable via
    `$ARTI3D_JAX_CACHE`).  Returns the directory used."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("ARTI3D_JAX_CACHE")
    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
