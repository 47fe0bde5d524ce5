"""Persistent XLA compilation cache for the task CLIs.

Cold compiles of production-size programs take minutes through this
platform's compile helper, but the persistent compilation cache works
across processes (round-3 measurement, CLAUDE.md "Benchmarking on
axon"): cached re-compiles land in seconds.  ``bench.py`` configures its
own cache; the task CLIs opt in via :func:`enable_compilation_cache`
before any jit executes.

Device-free: only touches ``jax.config`` (no backend initialisation).
"""
from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(directory: Optional[str] = None) -> str:
    """Point jax at a persistent on-disk compilation cache.

    Default location: ``$JAX_COMPILATION_CACHE_DIR``, else ``.jax_cache``
    at the repository root (gitignored; entries are ~100-300 MB for
    production-size programs).  Returns the directory used.
    """
    import jax

    directory = directory or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return directory
