"""Persistent-compile-cache scoping (utils/cache.py).

The CPU backend must never load an XLA:CPU AOT entry compiled under a
different CPU identity (SIGILL hazard — r2 VERDICT weak #5): CPU cache dirs
are fingerprint-scoped, and the driver-dryrun path disables the persistent
cache outright via cpu_policy="off".
"""

import jax

from text_guided_face_recognition_tpu.utils import cache


def test_cpu_cache_dir_is_fingerprint_scoped():
    # conftest forces the cpu platform, so the scoped branch is live here
    d = cache.compile_cache_dir()
    assert "_cpu_" in d
    suffix = d.rsplit("_", 1)[1]
    assert len(suffix) == 8 and int(suffix, 16) >= 0
    # stable within a process (same host identity, same jax)
    assert cache.compile_cache_dir() == d
    # a different base keeps the same fingerprint suffix
    assert cache.compile_cache_dir("/tmp/other").endswith(suffix)


def test_fingerprint_covers_cpu_model_and_jax_version(monkeypatch):
    base = cache._host_cpu_fingerprint()
    # jax version participates: fake a different jaxlib version string
    import jaxlib

    monkeypatch.setattr(jaxlib, "__version__", "0.0.0-test")
    assert cache._host_cpu_fingerprint() != base


def test_cpu_policy_off_disables_persistent_cache():
    prev_enabled = jax.config.jax_enable_compilation_cache
    prev_dir = jax.config.jax_compilation_cache_dir
    try:
        assert cache.enable_compile_cache(cpu_policy="off") == ""
        assert jax.config.jax_enable_compilation_cache is False
        path = cache.enable_compile_cache()  # default re-enables, scoped
        assert "_cpu_" in path
        assert jax.config.jax_enable_compilation_cache is True
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        jax.config.update("jax_enable_compilation_cache", prev_enabled)
        if prev_dir is not None:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
