"""Runtime/compile-cache configuration.

The reference amortises Numba's ~18 s cold start with ``cache=True``
(docs/PERFORMANCE.md:19-22). The TPU equivalent is JAX's persistent
compilation cache: the first compile of the fused timestep is expensive on
the remote TPU toolchain, subsequent processes load the compiled executable
from disk in milliseconds. Call ``setup()`` before the first jitted call.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "PYRMT_TPU_CACHE", os.path.expanduser("~/.cache/pyrmt_tpu_xla")
)


def setup(cache_dir: str | None = None, enable_x64: bool = False):
    """Enable the persistent XLA compilation cache (+ optional float64)."""
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if enable_x64:
        jax.config.update("jax_enable_x64", True)
    return cache_dir
