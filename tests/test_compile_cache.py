"""enable_compilation_cache host-fingerprint namespacing.

XLA's persistent cache deserializes CPU AOT executables compiled under a
different machine-feature set with only a log warning, and a cross-host
stale cache was observed producing silently wrong numerics (14
golden-parity tests red on 2026-08-21, green after clearing the
entries). The cache dir must therefore be namespaced per host so a
host/jax change can never load foreign executables.
"""

from pathlib import Path

import jax
import pytest


@pytest.fixture
def restore_cache_config():
    prior = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prior)


def test_cache_dir_is_host_namespaced(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.setenv("LEMON_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("LEMON_TPU_NO_COMPILE_CACHE", raising=False)
    from lemon_tpu.core import enable_compilation_cache

    assert enable_compilation_cache()
    configured = Path(jax.config.jax_compilation_cache_dir)
    # a per-host subdirectory of the requested base, not the base itself
    assert configured.parent == tmp_path
    assert configured.is_dir()
    # deterministic on the same host: a second call lands in the same place
    assert enable_compilation_cache()
    assert Path(jax.config.jax_compilation_cache_dir) == configured


def test_cache_opt_out(monkeypatch, restore_cache_config):
    monkeypatch.setenv("LEMON_TPU_NO_COMPILE_CACHE", "1")
    from lemon_tpu.core import enable_compilation_cache

    assert enable_compilation_cache() is False
