"""Runtime knobs shared by entry points."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    On the axon-tunneled TPU a cold f32 trunk compile costs 60-90s; the cache
    drops repeat CLI invocations (each mode is its own process, like the
    reference's) to milliseconds. Call before the first jit execution.
    """
    import jax

    path = path or os.environ.get(
        "FVY_COMPILE_CACHE", os.path.expanduser("~/.cache/fvy_jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only
