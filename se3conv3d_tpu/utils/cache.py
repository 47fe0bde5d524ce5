"""Persistent XLA compilation cache for the task CLIs.

Cold compiles of production-size programs take minutes through this
platform's compile helper, but the persistent compilation cache works
across processes (round-3 measurement, CLAUDE.md "Benchmarking on
axon"): cached re-compiles land in seconds.  ``bench.py`` and the task
CLIs opt in via :func:`enable_compilation_cache` before any jit executes.

Entries are namespaced per (platform, host machine): cached CPU
executables embed the compiling host's machine features and can SIGILL
when loaded after a re-provisioning onto different hardware
(``cpu_aot_loader`` feature-mismatch warnings in MULTICHIP_r03), and TPU
entries are useless to the CPU mesh anyway.  The accelerator namespace is
stable (``axon``); CPU namespaces carry a hash of the host CPU flags, so
a re-provisioned host starts a fresh CPU cache instead of loading
incompatible executables.

Device-free: only touches ``jax.config`` (no backend initialisation).
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional

__all__ = [
    "enable_compilation_cache",
    "platform_cache_tag",
    "verify_cache_platform",
]


def verify_cache_platform() -> bool:
    """Post-initialisation guard: cache namespace must match the backend.

    ``platform_cache_tag`` guesses ``axon`` for an unforced process
    before any backend exists; if the accelerator tunnel is down, JAX
    silently falls back to CPU AFTER the cache dir was configured — and
    persisting CPU AOT entries under the accelerator namespace is
    exactly the SIGILL/feature-mismatch hazard the namespacing prevents.
    Call once after the first successful device op (bench.py does, right
    after its backend probe): on mismatch the compilation cache is
    disabled for this process and False is returned.
    """
    import jax

    configured = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not configured:
        return True
    tag = os.path.basename(configured)
    backend = jax.default_backend().lower()
    if tag == backend or (tag.startswith("cpu-") and backend == "cpu"):
        return True
    jax.config.update("jax_compilation_cache_dir", None)
    return False


def platform_cache_tag() -> str:
    """Cache-namespace tag for the platform this process will compile for.

    Reads the *forced* platform (``jax.config jax_platforms`` or the
    ``JAX_PLATFORMS`` env var) without initialising a backend; an unforced
    process gets the environment's default accelerator (the axon TPU
    tunnel here).  CPU tags include a hash of ``/proc/cpuinfo`` flags so
    executables never outlive the machine features they were compiled
    with.
    """
    import jax

    plats = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    first = (plats or "").split(",")[0].strip().lower()
    if not first:
        # If a backend is ALREADY initialised, trust it over the
        # assumption: an unforced process whose accelerator tunnel is
        # down silently falls back to CPU, and persisting those CPU AOT
        # entries under the accelerator namespace is exactly the
        # SIGILL hazard the namespacing prevents.  (We never TRIGGER
        # initialisation here — this helper must stay device-free.)
        try:
            from jax._src import xla_bridge

            if getattr(xla_bridge, "_backends", None):
                first = jax.default_backend().lower()
        except Exception:  # noqa: BLE001 - private-API probe, best effort
            pass
    if not first:
        return "axon"
    if first != "cpu":
        return first
    try:
        with open("/proc/cpuinfo") as fh:
            feats = next(
                (line for line in fh if line.startswith("flags")), ""
            )
    except OSError:
        feats = ""
    if not feats:
        import platform as _platform

        feats = _platform.machine()
    return "cpu-" + hashlib.sha1(feats.encode()).hexdigest()[:8]


def enable_compilation_cache(directory: Optional[str] = None) -> str:
    """Point jax at a persistent on-disk compilation cache.

    Base location: ``$JAX_COMPILATION_CACHE_DIR``, else ``.jax_cache`` at
    the repository root (gitignored; entries are ~100-300 MB for
    production-size programs).  The per-platform namespace subdirectory
    (:func:`platform_cache_tag`) is appended to the base.  Returns the
    directory used.
    """
    import jax

    tag = platform_cache_tag()
    if tag.startswith("cpu-"):
        # No persistence on the CPU platform: CPU AOT executables embed
        # compile-machine features — a re-provisioned host can SIGILL on
        # them, and even same-host reloads spam cpu_aot_loader warnings
        # for +prefer-no-* tuning pseudo-features (measured r4).  The
        # CPU-mesh programs (dryrun / tests) compile cold in minutes,
        # well inside their budgets.
        return ""
    directory = directory or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    directory = os.path.join(directory, tag)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return directory
