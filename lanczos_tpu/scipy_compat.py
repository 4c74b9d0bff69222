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


def eigsh(a, k: int = 6, *, which: str = "LA", v0=None, maxiter=None, tol=None, return_eigenvectors: bool = True, **engine_kwargs):
    """Drop-in for ``scipy.sparse.linalg.eigsh`` (symmetric/Hermitian,
    extremal ends only).

    ``which``: 'LA' (largest algebraic) or 'SA' (smallest algebraic).
    Extra keyword arguments are set as attributes on the underlying
    :class:`~lanczos_tpu.api.LambdaLanczos` engine (e.g.
    ``restart_policy='thick'``, ``eigenvalue_offset=-4.0``).
    Returns ``(w, v)`` with scipy's column-vector convention ``v[:, i]``
    (or just ``w`` when ``return_eigenvectors=False``).
    """
    if which not in ("LA", "SA"):
        raise ValueError("which must be 'LA' (largest) or 'SA' (smallest)")
    eng = LambdaLanczos(_as_engine_operand(a), find_maximum=(which == "LA"), num_eigs=int(k))
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
    w = np.asarray(vals)
    # scipy returns ascending eigenvalues for both ends.
    order = np.argsort(w)
    w = w[order]
    if not return_eigenvectors:
        return w
    v = np.asarray(vecs)[order].T  # scipy column convention
    return w, v


def expm_multiply(a, b, *, t: float = 1.0, **engine_kwargs):
    """Drop-in for ``scipy.sparse.linalg.expm_multiply(A, B)`` (single time
    point): returns ``exp(t*A) @ B`` for a vector or a (n, m) block.

    Extra keyword arguments configure the underlying
    :class:`~lanczos_tpu.api.Exponentiator`.
    """
    expo = Exponentiator(_as_engine_operand(a))
    for key, val in engine_kwargs.items():
        if not hasattr(expo, key):
            raise TypeError(f"unknown engine option {key!r}")
        setattr(expo, key, val)
    b = np.asarray(b)
    if b.ndim == 1:
        out, _ = expo.run(t, jnp.asarray(b, expo.dtype))
        return np.asarray(out)
    outs, _ = expo.run_batch(t, jnp.asarray(b.T, expo.dtype))  # columns -> batch rows
    return np.asarray(outs).T
