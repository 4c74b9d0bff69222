"""Spectral-bound estimator tests (reference counterpart:
src/determine_eigenvalue_offset/determine_eigenvalue_offset.cpp:12-49)."""

import numpy as np
import jax.numpy as jnp

from lanczos_tpu.ops.operators import BSROperator, COOOperator, DenseOperator, FunctionOperator
from lanczos_tpu.utils.estimate import gershgorin_bound, power_bound, suggest_eigenvalue_offset


def _demo_matrix():
    # The reference demo's 3x3: eigenvalues {1, 1, -2}, inf-norm bound 2.
    return np.array([[0.0, 1.0, 1.0], [1.0, 0.0, -1.0], [1.0, -1.0, 0.0]])


def test_gershgorin_dense():
    assert gershgorin_bound(_demo_matrix()) == 2.0
    assert gershgorin_bound(DenseOperator(jnp.asarray(_demo_matrix()))) == 2.0


def test_gershgorin_coo():
    a = _demo_matrix()
    rows, cols = np.nonzero(a)
    op = COOOperator.from_arrays(rows, cols, jnp.asarray(a[rows, cols]), 3)
    assert gershgorin_bound(op) == 2.0


def test_gershgorin_bsr():
    a = _demo_matrix()
    rows, cols = np.nonzero(a)
    op = BSROperator.from_coo(rows, cols, a[rows, cols], 3, dtype=jnp.float64)
    assert gershgorin_bound(op) == 2.0


def test_power_bound_matrix_free():
    a = jnp.asarray(_demo_matrix())
    op = FunctionOperator(lambda x: a @ x, 3, np.dtype(np.float64))
    b = power_bound(op)
    assert 2.0 <= b <= 2.0 * 1.1 + 1e-9  # spectral radius 2, safety 1.1


def test_suggest_offset_signs():
    a = _demo_matrix()
    assert suggest_eigenvalue_offset(a, find_maximum=True) == 2.0
    assert suggest_eigenvalue_offset(a, find_maximum=False) == -2.0
