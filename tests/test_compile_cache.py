"""Persistent compilation cache wiring (utils/compile_cache.py).

The TPU-measured payoff (446 s -> 0.85 s cross-process, see
experiments/compile_cache_probe.py) can't run in CI; these tests pin the
wiring: config is set, the directory is created, and a compiled program
actually lands in the cache.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from lanczos_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _pristine_cache_singleton():
    """Fully tear down the persistent cache after each test.

    Resetting ``jax_compilation_cache_dir`` to None is NOT enough: jax keeps
    a module-level cache singleton that, once initialized, keeps attempting
    writes for every later compile in the process — against this test's
    now-deleted tmp_path.  In an in-process full-suite run (the coverage
    gate's ``-n 0``) one of those stray ``executable.serialize()`` calls
    (the 8-device multislice program) segfaults inside jaxlib.  Observed as
    a deterministic coverage-run crash in test_sharded; the xdist run never
    sees it because these files land in different workers.
    """
    yield
    jax.config.update("jax_compilation_cache_dir", None)
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()


def test_enable_sets_config_and_persists(tmp_path):
    d = str(tmp_path / "jaxcache")
    got = compile_cache.enable_compilation_cache(d, min_compile_time_secs=0.0)
    try:
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        @jax.jit
        def f(x):
            return jnp.sin(x) @ x.T

        _ = f(jnp.ones((64, 64))).block_until_ready()
        entries = [p for p in os.listdir(d)]
        assert entries, "compiled executable was not persisted"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_default_dir_honors_env(monkeypatch, tmp_path):
    monkeypatch.setenv(compile_cache._ENV_VAR, str(tmp_path / "envcache"))
    assert compile_cache.default_cache_dir() == str(tmp_path / "envcache")
    try:
        assert compile_cache.maybe_enable_from_env() == str(tmp_path / "envcache")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
    monkeypatch.delenv(compile_cache._ENV_VAR)
    assert compile_cache.default_cache_dir().endswith(os.path.join(".cache", "lanczos_tpu", "jax"))


def test_maybe_enable_noop_without_env(monkeypatch):
    monkeypatch.delenv(compile_cache._ENV_VAR, raising=False)
    assert compile_cache.maybe_enable_from_env() is None
