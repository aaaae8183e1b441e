"""utils/cache.py: persistent-compilation-cache knob wiring."""

import os

import jax

from tpu_fluid.utils.cache import enable_compilation_cache


def test_enable_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv("TPU_FLUID_NO_CACHE", raising=False)
    d = str(tmp_path / "xla")
    got = enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_disable_env(monkeypatch, tmp_path):
    monkeypatch.setenv("TPU_FLUID_NO_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "y")) is None
    assert not os.path.isdir(str(tmp_path / "y"))


def test_env_dir_override(monkeypatch, tmp_path):
    monkeypatch.delenv("TPU_FLUID_NO_CACHE", raising=False)
    d = str(tmp_path / "envdir")
    monkeypatch.setenv("TPU_FLUID_CACHE_DIR", d)
    assert enable_compilation_cache() == d
