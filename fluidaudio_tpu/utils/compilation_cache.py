"""Persistent XLA compilation cache.

First compiles on the TPU relay are minutes-scale (e.g. 128 s for the mel
FFT at batch 4); the persistent cache makes every later process start warm.
Call once before the first jit execution.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    """Idempotent; set FLUID_NO_JAX_CACHE=1 to opt out."""
    global _ENABLED
    if _ENABLED or os.environ.get("FLUID_NO_JAX_CACHE"):
        return
    import jax

    if cache_dir is None and jax.config.jax_compilation_cache_dir:
        _ENABLED = True  # caller (e.g. tests) already configured a cache
        return

    path = Path(
        cache_dir
        or os.environ.get("FLUID_JAX_CACHE")
        or Path.home() / ".cache" / "fluidaudio" / "jax_cache"
    )
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED = True
