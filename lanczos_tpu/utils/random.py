"""Initial-vector generators (reference: VectorRandomInitializer,
include/lambda_lanczos/lambda_lanczos.hpp:70-104).

The reference draws every element uniformly from [-1, 1] (both real and
imaginary part for complex types) from a fresh ``random_device``-seeded
engine on *every* call — i.e. the default is nondeterministic per restart,
and tests override ``init_vector`` with a fixed-seed generator that produces
the *same* vector on each call (test/lambda_lanczos_test.cpp:25-45).  Both
behaviors are reproduced here.
"""

from __future__ import annotations

import numpy as np

from ..core.types import is_complex_dtype, real_dtype

__all__ = ["random_initializer", "fixed_seed_initializer"]


def _draw(rng, n, dtype):
    dtype = np.dtype(dtype)
    if is_complex_dtype(dtype):
        r = rng.uniform(-1.0, 1.0, size=n)
        i = rng.uniform(-1.0, 1.0, size=n)
        return (r + 1j * i).astype(dtype)
    return rng.uniform(-1.0, 1.0, size=n).astype(dtype)


def _fresh_rng():
    """A fresh-entropy generator that is CONSISTENT across processes.

    In a multi-process run every process executes the same host driver
    logic; a per-process entropy draw makes the nominally-replicated init
    vector DIFFER between processes, which silently degrades the hybrid
    engine (each process's replica contributes its own rows — measured
    9.7e-6 instead of 1e-15 on the 2-process stencil before this fix).
    Process 0's entropy is broadcast to everyone, so each restart still
    sees a fresh vector (the reference default, lambda_lanczos.hpp:79-88)
    but all processes see the SAME one.
    """
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        local = np.uint64(np.random.SeedSequence().entropy & ((1 << 64) - 1))
        seed = int(multihost_utils.broadcast_one_to_all(local))
        return np.random.default_rng(seed)
    return np.random.default_rng()


def random_initializer(dtype):
    """Fresh-entropy uniform [-1, 1] init, new draw every call (the
    reference default, lambda_lanczos.hpp:79-88); cross-process consistent
    (see :func:`_fresh_rng`)."""

    def init(n: int):
        return _draw(_fresh_rng(), n, dtype)

    return init


def fixed_seed_initializer(dtype, seed: int = 1):
    """Deterministic init: a fresh engine with the same seed every call, so
    every restart sees the same vector (the reference test hook,
    test/lambda_lanczos_test.cpp:25-45)."""

    def init(n: int):
        return _draw(np.random.default_rng(seed), n, dtype)

    return init
