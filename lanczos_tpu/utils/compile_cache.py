"""Persistent XLA compilation cache — the production cold-start fix.

The fused while_loop engines compile into a handful of large XLA programs;
through a remote-TPU tunnel a single n=4M program costs 30-450 s to
compile.  JAX's persistent compilation cache serializes the compiled
executable to disk, so every process after the first loads it instead of
recompiling — measured on the real v5e through the axon tunnel:
446 s cold -> **0.85 s** hot for the n=2^20 fused engine
(``experiments/compile_cache_probe.py``).

Opt-in (a library must not silently mutate global jax config):

- call :func:`enable_compilation_cache` before the first solve, or
- set ``LANCZOS_TPU_CACHE_DIR=/path`` in the environment and the package
  enables it automatically at import.

The reference is a header-only C++ library whose "compile once" is the
user's build system (/root/reference/README.md: include-and-compile); on
an XLA runtime the executable cache is the equivalent deployment step.
"""

from __future__ import annotations

import os

_ENV_VAR = "LANCZOS_TPU_CACHE_DIR"
_enabled_dir: str | None = None


def default_cache_dir() -> str:
    return os.environ.get(_ENV_VAR) or os.path.join(
        os.path.expanduser("~"), ".cache", "lanczos_tpu", "jax"
    )


def enable_compilation_cache(cache_dir: str | None = None, *, min_compile_time_secs: float = 0.0) -> str:
    """Point jax's persistent compilation cache at ``cache_dir`` (created if
    absent) and return the directory.  Idempotent; safe to call before or
    after other jax use (affects programs compiled from then on).

    ``min_compile_time_secs``: 0.0 persists *everything* — the right default
    for a remote-TPU backend, where even a trivial program's compile costs a
    full tunnel round trip (~0.4-2 s); raise it to keep the cache small on
    a local backend.
    """
    global _enabled_dir
    import jax

    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs))
    _enabled_dir = cache_dir
    return cache_dir


def maybe_enable_from_env() -> str | None:
    """Enable the cache iff ``LANCZOS_TPU_CACHE_DIR`` is set (import hook)."""
    if os.environ.get(_ENV_VAR):
        return enable_compilation_cache(os.environ[_ENV_VAR])
    return None
