"""scipy.sparse.linalg-compatible facade.

Users coming from ``scipy.sparse.linalg.eigsh`` / ``expm_multiply`` get the
same call shapes backed by the TPU engines.  Only the Hermitian/symmetric
subset the reference library covers is exposed (`which` in {'LA', 'SA'}).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .api import Exponentiator, LambdaLanczos
from .ops.operators import LinearOperator

__all__ = ["eigsh", "expm_multiply"]


def _as_engine_operand(a):
    if isinstance(a, LinearOperator):
        return a
    try:  # scipy.sparse matrix
        import scipy.sparse as sp

        if sp.issparse(a):
            from .ops.operators import CSROperator

            return CSROperator.from_scipy(a)
    except ImportError:  # pragma: no cover
        pass
    return jnp.asarray(a)


def _one_end(operand, k, find_maximum, v0, maxiter, tol, engine_kwargs):
    eng = LambdaLanczos(operand, find_maximum=find_maximum, num_eigs=int(k))
    if maxiter is not None:
        eng.max_iteration = int(maxiter)
    if tol is not None:
        # scipy semantics: tol=0 means "machine precision", not "default".
        from .core.types import machine_eps

        eng.eps = float(tol) if tol > 0 else machine_eps(eng.dtype)
    if v0 is not None:
        eng.init_vector = v0
    for key, val in engine_kwargs.items():
        if not hasattr(eng, key):
            raise TypeError(f"unknown engine option {key!r}")
        setattr(eng, key, val)
    vals, vecs = eng.run()
    return np.asarray(vals), np.asarray(vecs)


def eigsh(a, k: int = 6, *, which: str = "LA", v0=None, maxiter=None, tol=None, return_eigenvectors: bool = True, sigma=None, **engine_kwargs):
    """Drop-in for ``scipy.sparse.linalg.eigsh`` (symmetric/Hermitian).

    ``which``: 'LA' (largest algebraic), 'SA' (smallest algebraic), or 'BE'
    (both ends: k//2 from each end, one extra from the high end when k is
    odd — scipy's split).  ``sigma`` (shift-invert) is out of scope for a
    Krylov-only backend and raises NotImplementedError; use
    ``eigenvalue_offset`` (spectral shift) to steer convergence instead.
    Extra keyword arguments are set as attributes on the underlying
    :class:`~lanczos_tpu.api.LambdaLanczos` engine (e.g.
    ``restart_policy='thick'``, ``eigenvalue_offset=-4.0``,
    ``precise_vectors=True``).
    Returns ``(w, v)`` with scipy's column-vector convention ``v[:, i]``
    (or just ``w`` when ``return_eigenvectors=False``).
    """
    if sigma is not None:
        raise NotImplementedError(
            "sigma/shift-invert needs an inner linear solve, which this Krylov-only "
            "backend does not provide; use eigenvalue_offset to shift the spectrum"
        )
    if which not in ("LA", "SA", "BE"):
        raise ValueError("which must be 'LA' (largest), 'SA' (smallest) or 'BE' (both ends)")
    operand = _as_engine_operand(a)
    if which == "BE":
        k = int(k)
        k_hi = k - k // 2  # scipy: the extra one comes from the high end
        k_lo = k // 2
        w_hi, v_hi = _one_end(operand, k_hi, True, v0, maxiter, tol, engine_kwargs)
        w_lo, v_lo = (np.zeros(0), np.zeros((0, v_hi.shape[1]))) if k_lo == 0 else _one_end(
            operand, k_lo, False, v0, maxiter, tol, engine_kwargs
        )
        w = np.concatenate([w_lo, w_hi])
        vecs = np.concatenate([v_lo, v_hi], axis=0)
    else:
        w, vecs = _one_end(operand, k, which == "LA", v0, maxiter, tol, engine_kwargs)
    # scipy returns ascending eigenvalues for every `which`.
    order = np.argsort(w)
    w = w[order]
    if not return_eigenvectors:
        return w
    return w, vecs[order].T  # scipy column convention


def expm_multiply(a, b, *, t: float = 1.0, start=None, stop=None, num=None, endpoint=None, **engine_kwargs):
    """Drop-in for ``scipy.sparse.linalg.expm_multiply(A, B)``.

    Single point: ``exp(t*A) @ B`` for a vector or a (n, m) block.
    Time grid (scipy's start/stop/num/endpoint): returns the stacked
    ``exp(t_i*A) @ B`` with shape (num, n) for a vector b or (num, n, m)
    for a block — computed from ONE Krylov build per input vector (time
    enters only through host-side coefficients).

    Extra keyword arguments configure the underlying
    :class:`~lanczos_tpu.api.Exponentiator`.
    """
    expo = Exponentiator(_as_engine_operand(a))
    for key, val in engine_kwargs.items():
        if not hasattr(expo, key):
            raise TypeError(f"unknown engine option {key!r}")
        setattr(expo, key, val)
    b = np.asarray(b)
    if start is not None or stop is not None or num is not None:
        if start is None or stop is None or num is None:
            raise ValueError("time grids need start, stop and num together (scipy semantics)")
        ts = np.linspace(float(start), float(stop), int(num), endpoint=True if endpoint is None else bool(endpoint))
        if b.ndim == 1:
            outs, _ = expo.run_grid(list(ts), jnp.asarray(b, expo.dtype))
            return np.asarray(outs)
        cols = [np.asarray(expo.run_grid(list(ts), jnp.asarray(b[:, j], expo.dtype))[0]) for j in range(b.shape[1])]
        return np.stack(cols, axis=-1)  # (num, n, m)
    if b.ndim == 1:
        out, _ = expo.run(t, jnp.asarray(b, expo.dtype))
        return np.asarray(out)
    outs, _ = expo.run_batch(t, jnp.asarray(b.T, expo.dtype))  # columns -> batch rows
    return np.asarray(outs).T
