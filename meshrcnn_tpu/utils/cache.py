"""Persistent XLA compilation cache setup.

Full-model train steps take 1-3 minutes of XLA compile at production shapes; the
persistent cache makes every repeat CLI invocation start in seconds. Called by all
entry points before the first jit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".xla_cache")
    path = path or os.environ.get("MESHRCNN_COMPILATION_CACHE", default)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
