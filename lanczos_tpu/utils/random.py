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


def random_initializer(dtype):
    """Fresh-entropy uniform [-1, 1] init, new draw every call (the
    reference default, lambda_lanczos.hpp:79-88)."""

    def init(n: int):
        return _draw(np.random.default_rng(), n, dtype)

    return init


def fixed_seed_initializer(dtype, seed: int = 1):
    """Deterministic init: a fresh engine with the same seed every call, so
    every restart sees the same vector (the reference test hook,
    test/lambda_lanczos_test.cpp:25-45)."""

    def init(n: int):
        return _draw(np.random.default_rng(seed), n, dtype)

    return init
