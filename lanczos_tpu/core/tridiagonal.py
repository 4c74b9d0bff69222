"""Tridiagonal eigensolvers (the reference's L3 layer).

Reference counterparts:
* implicit-shift QR:  include/lambda_lanczos/lambda_lanczos_tridiagonal_impl.hpp:181-343
* Sturm bisection:    include/lambda_lanczos/lambda_lanczos_tridiagonal_impl.hpp:22-134
* LAPACK ?stev:       include/lambda_lanczos/lambda_lanczos_tridiagonal_lapack.hpp:22-88

Like the reference, the solver layer is a swappable backend behind one
interface (reference selects by compile flags, lambda_lanczos_tridiagonal.hpp:4-20;
we select at runtime):

``host`` backends (numpy in / numpy out, always float64 — the m x m problem is
tiny relative to the n-dimensional matvec, so full double precision here is
free and is what lets the TPU build match the reference's 1e-12..1e-14
eigenvalue tolerances):

* ``lapack`` — scipy's ``eigh_tridiagonal``/``eigh`` (LAPACK stev/steqr).
* ``native`` — the C++ implicit-shift QR in lanczos_tpu/native (ctypes), the
  analogue of the reference's self-contained impl backend.
* ``numpy``  — densify + ``numpy.linalg.eigh`` (always available fallback).

``device`` backend (jit-friendly, used inside the fused `lax.while_loop`
Lanczos engine where a host round-trip per iteration would stall the TPU):

* :func:`extremal_eigenvalues_device` — vectorized Sturm-count bisection for
  the ``nroot`` smallest/largest eigenvalues with a *dynamic* active size on a
  *static* buffer, the shape discipline XLA needs.

Eigenvector layout matches the reference convention: ``vecs[k, :]`` is the
k-th eigenvector (tridiagonal_impl.hpp:177-179), eigenvalues ascending
(tridiagonal_impl.hpp:340).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "eigh_tridiagonal_host",
    "eigvals_tridiagonal_host",
    "extremal_eigenvalues_device",
    "set_default_host_backend",
]

_DEFAULT_HOST_BACKEND = "auto"


def set_default_host_backend(name: str) -> None:
    """Set the process-wide default host backend ('auto', 'lapack', 'native',
    'numpy')."""
    global _DEFAULT_HOST_BACKEND
    if name not in ("auto", "lapack", "native", "numpy"):
        raise ValueError(f"unknown tridiagonal backend {name!r}")
    _DEFAULT_HOST_BACKEND = name


def _resolve_backend(backend: str | None) -> str:
    backend = backend or _DEFAULT_HOST_BACKEND
    if backend != "auto":
        return backend
    if _native_available():
        return "native"
    try:
        import scipy.linalg  # noqa: F401

        return "lapack"
    except Exception:  # pragma: no cover
        return "numpy"


@functools.cache
def _native_module():
    try:
        from ..native import host_kernels

        return host_kernels if host_kernels.available() else None
    except Exception:
        return None


def _native_available() -> bool:
    return _native_module() is not None


def eigh_tridiagonal_host(alpha, beta, *, eigvals_only: bool = False, backend: str | None = None):
    """Eigen-decompose the symmetric tridiagonal (diag=alpha, offdiag=beta).

    Returns ``(eigvals,)`` if ``eigvals_only`` else ``(eigvals, eigvecs)``
    with ``eigvecs[k]`` the k-th eigenvector, eigenvalues ascending.
    """
    alpha = np.asarray(alpha, dtype=np.float64).reshape(-1)
    beta = np.asarray(beta, dtype=np.float64).reshape(-1)
    m = alpha.shape[0]
    if beta.shape[0] not in (max(m - 1, 0), m):
        raise ValueError(f"beta must have length m-1 (or m with a trailing slot), got {beta.shape[0]} for m={m}")
    beta = beta[: m - 1]

    if m == 0:
        raise ValueError("empty tridiagonal matrix")
    if m == 1:
        if eigvals_only:
            return (alpha.copy(),)
        return alpha.copy(), np.ones((1, 1), dtype=np.float64)

    backend = _resolve_backend(backend)
    if backend == "native":
        mod = _native_module()
        if mod is None:
            raise RuntimeError("native tridiagonal backend requested but the C++ extension is not built")
        return mod.tridiagonal_eigh(alpha, beta, eigvals_only=eigvals_only)

    if backend == "lapack":
        from scipy.linalg import eigh_tridiagonal as _stev

        if eigvals_only:
            w = _stev(alpha, beta, eigvals_only=True)
            return (np.asarray(w),)
        w, z = _stev(alpha, beta)
        # scipy returns column eigenvectors; reference layout is row-per-vector
        # (tridiagonal_impl.hpp:177-179, mirrored by the LAPACK backend's
        # unpack at lambda_lanczos_tridiagonal_lapack.hpp:63-69).
        return np.asarray(w), np.ascontiguousarray(z.T)

    # numpy fallback: densify (m is the Krylov dimension — small).
    t = np.diag(alpha)
    if m > 1:
        t += np.diag(beta, 1) + np.diag(beta, -1)
    if eigvals_only:
        return (np.linalg.eigvalsh(t),)
    w, z = np.linalg.eigh(t)
    return w, np.ascontiguousarray(z.T)


def eigvals_tridiagonal_host(alpha, beta, *, backend: str | None = None):
    """Eigenvalues only (ascending)."""
    return eigh_tridiagonal_host(alpha, beta, eigvals_only=True, backend=backend)[0]


# ---------------------------------------------------------------------------
# Device (jittable) Sturm bisection
# ---------------------------------------------------------------------------


def _sturm_count(c, alpha, beta_sq, size):
    """Number of eigenvalues of the leading ``size`` x ``size`` block < c.

    Masked, static-shape version of the Sturm-sequence count
    (reference: tridiagonal_impl.hpp:22-43).  ``alpha`` has static capacity
    (cap,), ``beta_sq`` is beta**2 with beta_sq[i] coupling i and i+1;
    ``size`` is a dynamic scalar <= cap.
    """
    rdtype = alpha.dtype
    tiny = jnp.asarray(np.finfo(np.dtype(rdtype)).eps, rdtype)
    cap = alpha.shape[0]

    def body(carry, i):
        q_prev, count = carry
        q = jnp.where(i == 0, alpha[0] - c, alpha[i] - c - beta_sq[jnp.maximum(i - 1, 0)] / q_prev)
        q = jnp.where(q == 0, tiny, q)
        active = i < size
        count = count + jnp.where(active & (q < 0), jnp.int32(1), jnp.int32(0))
        q_prev = jnp.where(active, q, q_prev)
        return (q_prev, count), None

    (_, count), _ = jax.lax.scan(body, (jnp.asarray(1.0, rdtype), jnp.int32(0)), jnp.arange(cap), unroll=16)
    return count


def extremal_eigenvalues_device(alpha, beta, size, nroot: int, find_maximum: bool, *, iters: int | None = None):
    """The ``nroot`` smallest (or largest) eigenvalues of the leading
    ``size`` x ``size`` tridiagonal block, fully on device.

    Bisection per root over the Gershgorin-style interval
    ``|lambda| <= m_norm(alpha) + 2 m_norm(beta)``
    (reference: tridiagonal_impl.hpp:52-58, :63-88), vectorized over roots via
    vmap; each Sturm count is a masked ``lax.scan`` of static length.

    Returns an (nroot,) array ordered the way the Lanczos convergence test
    consumes it (reference: lambda_lanczos.hpp:267-277): ``result[i]`` is the
    i-th largest eigenvalue when ``find_maximum`` else the i-th smallest.
    Roots with index >= ``size`` are duplicates of the closest valid root
    (callers mask them out of the convergence test).
    """
    rdtype = alpha.dtype
    if iters is None:
        iters = 110 if np.dtype(rdtype) == np.float64 else 46
    cap = alpha.shape[0]
    mask = (jnp.arange(cap) < size).astype(rdtype)
    beta_mask = (jnp.arange(cap) < size - 1).astype(rdtype)
    beta_sq = (beta * beta_mask) ** 2
    limit = jnp.sum(jnp.abs(alpha) * mask) + 2.0 * jnp.sum(jnp.abs(beta * beta_mask))

    # Target eigenvalue indices (ascending order index m): i-th largest is
    # size-1-i; i-th smallest is i.  Clamp into the valid range.
    idx = jnp.arange(nroot)
    if find_maximum:
        m_indices = jnp.clip(size - 1 - idx, 0, None)
    else:
        m_indices = jnp.minimum(idx, size - 1)

    def find_mth(m_idx):
        def body(_, lu):
            lower, upper = lu
            mid = (lower + upper) * 0.5
            smaller = _sturm_count(mid, alpha, beta_sq, size)
            go_down = smaller >= m_idx + 1
            return jnp.where(go_down, lower, mid), jnp.where(go_down, mid, upper)

        lower, upper = jax.lax.fori_loop(0, iters, body, (-limit, limit))
        return lower

    return jax.vmap(find_mth)(m_indices)
