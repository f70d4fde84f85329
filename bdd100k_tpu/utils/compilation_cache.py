"""Persistent XLA compilation cache (drivers + benches call this first).

SSD300/VGG512 compiles take minutes over a remote-TPU tunnel; the persistent
cache makes every process after the first start in seconds. Safe to call
unconditionally — harmless on CPU and when already configured.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or "/tmp/jax_compilation_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
