"""Tridiagonal-solver tests, mirroring the reference TRIDIAGONAL_TEST suite
(test/lambda_lanczos_test.cpp:757-801) across all backends."""

import numpy as np
import jax.numpy as jnp
import pytest

from lanczos_tpu.core import tridiagonal

BACKENDS = ["lapack", "numpy", "native"]


def _skip_if_unavailable(backend):
    if backend == "native":
        from lanczos_tpu.native import host_kernels

        if not host_kernels.available():
            pytest.skip("native extension not built")


@pytest.mark.parametrize("backend", BACKENDS)
def test_known_3x3(backend):
    # Reference TRIDIAGONAL_TEST.IMPLICIT_SHIFT_QR (lambda_lanczos_test.cpp:757-784):
    # diag {1,2,3}, offdiag {2,2} -> eigvals {-1,2,5}, known eigenvectors.
    _skip_if_unavailable(backend)
    vals, vecs = tridiagonal.eigh_tridiagonal_host([1.0, 2.0, 3.0], [2.0, 2.0], backend=backend)
    np.testing.assert_allclose(vals, [-1.0, 2.0, 5.0], atol=1e-10)
    expected = np.array([[2, -2, 1], [2, 1, -2], [1, 2, 2]], dtype=float)
    expected /= np.linalg.norm(expected, axis=1, keepdims=True)
    for i in range(3):
        sign = np.sign(vecs[i, 0])
        np.testing.assert_allclose(vecs[i] * sign, expected[i] * np.sign(expected[i, 0]), atol=1e-10)


@pytest.mark.parametrize("backend", BACKENDS)
def test_near_null_input_no_nan(backend):
    # Reference TRIDIAGONAL_TEST.NULL_EIGENVALUE_NO_ASSERTS
    # (lambda_lanczos_test.cpp:786-801): denormal-scale entries must not NaN.
    _skip_if_unavailable(backend)
    alpha = [6.82333617e-03, 3.09398208e00, 1.89919458e00, 1.28531906e-16]
    beta = [1.19582528e-01, -1.37689656e00, 6.16147405e-15]
    vals, vecs = tridiagonal.eigh_tridiagonal_host(alpha, beta, backend=backend)
    assert np.all(np.isfinite(vals))
    assert np.all(np.isfinite(vecs))


@pytest.mark.parametrize("backend", BACKENDS)
def test_eigvals_only(backend):
    _skip_if_unavailable(backend)
    (vals,) = tridiagonal.eigh_tridiagonal_host([1.0, 2.0, 3.0], [2.0, 2.0], eigvals_only=True, backend=backend)
    np.testing.assert_allclose(vals, [-1.0, 2.0, 5.0], atol=1e-10)


def test_single_element():
    vals, vecs = tridiagonal.eigh_tridiagonal_host([7.0], [])
    np.testing.assert_allclose(vals, [7.0])
    np.testing.assert_allclose(vecs, [[1.0]])


@pytest.mark.parametrize("backend", BACKENDS)
def test_backends_agree_random(backend):
    _skip_if_unavailable(backend)
    rng = np.random.default_rng(3)
    m = 37
    alpha = rng.normal(size=m)
    beta = rng.normal(size=m - 1)
    vals, vecs = tridiagonal.eigh_tridiagonal_host(alpha, beta, backend=backend)
    ref = np.linalg.eigvalsh(np.diag(alpha) + np.diag(beta, 1) + np.diag(beta, -1))
    np.testing.assert_allclose(vals, ref, atol=1e-12)
    # residual check: T v = lambda v
    t = np.diag(alpha) + np.diag(beta, 1) + np.diag(beta, -1)
    for i in range(m):
        np.testing.assert_allclose(t @ vecs[i], vals[i] * vecs[i], atol=1e-10)


def test_device_bisection_extremal():
    rng = np.random.default_rng(5)
    m, cap = 23, 32
    alpha_np = rng.normal(size=m)
    beta_np = rng.normal(size=m - 1)
    ref = np.linalg.eigvalsh(np.diag(alpha_np) + np.diag(beta_np, 1) + np.diag(beta_np, -1))

    alpha = jnp.zeros(cap, jnp.float64).at[:m].set(alpha_np)
    beta = jnp.zeros(cap, jnp.float64).at[: m - 1].set(beta_np)

    lo = tridiagonal.extremal_eigenvalues_device(alpha, beta, m, 3, find_maximum=False)
    np.testing.assert_allclose(np.asarray(lo), ref[:3], atol=1e-11)

    hi = tridiagonal.extremal_eigenvalues_device(alpha, beta, m, 3, find_maximum=True)
    np.testing.assert_allclose(np.asarray(hi), ref[::-1][:3], atol=1e-11)


def test_device_bisection_f32():
    rng = np.random.default_rng(7)
    m, cap = 11, 16
    alpha_np = rng.normal(size=m).astype(np.float32)
    beta_np = rng.normal(size=m - 1).astype(np.float32)
    ref = np.linalg.eigvalsh(
        np.diag(alpha_np.astype(np.float64)) + np.diag(beta_np.astype(np.float64), 1) + np.diag(beta_np.astype(np.float64), -1)
    )
    alpha = jnp.zeros(cap, jnp.float32).at[:m].set(alpha_np)
    beta = jnp.zeros(cap, jnp.float32).at[: m - 1].set(beta_np)
    lo = tridiagonal.extremal_eigenvalues_device(alpha, beta, m, 2, find_maximum=False)
    np.testing.assert_allclose(np.asarray(lo), ref[:2], atol=1e-5)


@pytest.mark.parametrize("backend", ["native", "lapack", "numpy"])
@pytest.mark.parametrize("find_maximum", [False, True])
def test_extremal_eigvals_host(backend, find_maximum):
    from lanczos_tpu.core.tridiagonal import extremal_eigvals_host

    rng = np.random.default_rng(1)
    m = 30
    alpha = rng.standard_normal(m)
    beta = rng.standard_normal(m - 1)
    t = np.diag(alpha) + np.diag(beta, 1) + np.diag(beta, -1)
    full = np.linalg.eigvalsh(t)
    want = full[::-1][:4] if find_maximum else full[:4]
    got = extremal_eigvals_host(alpha, beta, 4, find_maximum, backend=backend)
    np.testing.assert_allclose(got, want, atol=1e-11)
