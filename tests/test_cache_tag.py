"""Compilation-cache namespace guards (utils/cache.py).

The r4 advisor flagged the silent-CPU-fallback hazard: an unforced
process tags its cache 'axon' before any backend exists; if the tunnel
is down JAX falls back to CPU and would persist CPU AOT entries under
the accelerator namespace.  ``verify_cache_platform`` (called by
bench.py after its first device op) must detect the mismatch and
disable the cache.
"""
import jax
import pytest

from se3conv3d_tpu.utils.cache import platform_cache_tag, verify_cache_platform


@pytest.fixture
def restore_cache_dir():
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_mismatched_namespace_disables_cache(restore_cache_dir):
    # conftest forces the CPU backend; an 'axon'-tagged dir is the
    # tunnel-down fallback scenario.
    jax.config.update("jax_compilation_cache_dir", "/tmp/fake_cache/axon")
    assert verify_cache_platform() is False
    assert not getattr(jax.config, "jax_compilation_cache_dir", None)


def test_matching_namespace_keeps_cache(restore_cache_dir):
    backend = jax.default_backend().lower()
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/fake_cache/{backend}"
    )
    assert verify_cache_platform() is True
    assert getattr(jax.config, "jax_compilation_cache_dir", None)


def test_cpu_hash_namespace_matches_cpu_backend(restore_cache_dir):
    if jax.default_backend().lower() != "cpu":
        pytest.skip("needs the CPU backend")
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/fake_cache/cpu-abcd1234"
    )
    assert verify_cache_platform() is True


def test_unconfigured_cache_is_fine(restore_cache_dir):
    jax.config.update("jax_compilation_cache_dir", None)
    assert verify_cache_platform() is True


def test_platform_tag_reflects_forced_platform():
    # tests force the CPU platform (conftest) -> cpu-<feature hash>
    tag = platform_cache_tag()
    assert tag.startswith("cpu-") and len(tag) == 4 + 8
