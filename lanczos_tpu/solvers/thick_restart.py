"""Thick-restart Lanczos (TRLan-style) — bounded memory with subspace reuse.

The plain bounded-memory mode (``run_restarted``) restarts from a single Ritz
vector and loses the rest of the subspace — fine for gapped spectra, slow for
clustered ones (the n=400 chain stalls at ~1e-4).  Thick restart keeps the
best ``l`` Ritz vectors *with their exact couplings* and continues the build,
recovering near-unrestarted convergence at O(max_iteration * n) memory
(Wu & Simon, SIAM J. Matrix Anal. 2000).

Formulation: instead of carrying the three-term alpha/beta recurrence plus an
arrowhead correction, this engine maintains the **projected matrix**
``T = V^H (A + offset) V`` directly on host — each iteration's CGS
projection coefficients (computed anyway for the full reorthogonalization)
ARE the new T column, so after a restart the Ritz-vector couplings appear
automatically when the next column is projected.  T is Hermitian by
symmetrization; eigh(T) on host float64 drives the same relative-drift
convergence test as the reference (lambda_lanczos.hpp:267-309).

Device work per iteration: one matvec + the same CGS matmuls as the full
engines; host work: one small eigh.  The projection coefficients are pulled
to host each iteration (hybrid-style; this engine targets memory-bound
convergence, not minimum host traffic — use mode='fused' when the basis fits).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import linalg
from ..core.types import is_complex_dtype, machine_eps, real_dtype
from .lanczos import LanczosConfig, _prepare_init_vector

__all__ = ["thick_lanczos_iteration", "lanczos_run_thick"]


@functools.partial(jax.jit, donate_argnums=(1,))
def _project_step(op, basis, defl, defl_mask, nb, offset):
    """w = (A + offset) v_{nb-1}; project against defl and the basis rows
    [0, nb); returns (basis', c (cap,), beta) with basis' holding the
    normalized residual at row nb.

    ``c`` are the FIRST-pass CGS coefficients — the new column of the
    projected matrix T (the second pass only polishes orthogonality and its
    coefficients are O(eps), irrelevant to T at solver precision).
    """
    dtype = basis.dtype
    rdtype = np.dtype(real_dtype(dtype))
    cap = basis.shape[0]

    v = jax.lax.dynamic_index_in_dim(basis, nb - 1, axis=0, keepdims=False)
    w = op.matvec(v)
    w = w + offset.astype(rdtype) * v

    w = linalg.orthogonalize_cgs2(w, defl, defl_mask)

    row_mask = (jnp.arange(cap) < nb).astype(rdtype)
    c = linalg._project_coeffs(basis, w, row_mask)
    w = w - jnp.matmul(c, basis, precision=jax.lax.Precision.HIGHEST)
    # Second (polish) pass.
    c2 = linalg._project_coeffs(basis, w, row_mask)
    w = w - jnp.matmul(c2, basis, precision=jax.lax.Precision.HIGHEST)

    beta = linalg.norm(w).astype(rdtype)
    tiny = jnp.asarray(np.finfo(rdtype).tiny, rdtype)
    basis = jax.lax.dynamic_update_slice_in_dim(basis, (w / jnp.maximum(beta, tiny))[None], nb, axis=0)
    return basis, c + c2, beta


@jax.jit
def _rotate_basis(q, basis):
    """New basis rows = q @ basis (Ritz recombination on device)."""
    return jnp.matmul(q.astype(basis.dtype), basis, precision=jax.lax.Precision.HIGHEST)


def thick_lanczos_iteration(op, v0, nroot: int, defl, defl_mask, cfg: LanczosConfig):
    """One deflated solve with internal thick restarts; same return contract
    as :func:`lanczos_tpu.solvers.lanczos.lanczos_iteration`:
    (eigenvalues, eigenvectors, total_iterations, converged)."""
    dtype = np.dtype(v0.dtype)
    rdtype = real_dtype(dtype)
    n = cfg.matrix_size
    m_max = max(min(cfg.max_iteration, n), 2)
    l_keep = max(min(nroot + 2, m_max - 2), 1)
    host_c = np.complex128 if is_complex_dtype(dtype) else np.float64

    v0 = _prepare_init_vector(v0, defl, defl_mask)
    basis = jnp.zeros((m_max + 1, n), dtype).at[0].set(v0)
    t_host = np.zeros((m_max + 1, m_max + 1), dtype=host_c)

    # Invariant: rows [0, m_val] of ``basis`` are orthonormal; rows
    # [0, m_val) span the Rayleigh-Ritz space with completed projected
    # matrix t_host[:m_val, :m_val]; row m_val is the next candidate
    # (the newest normalized residual).
    m_val = 0
    total_iters = 0
    pevs: np.ndarray | None = None
    converged = False
    breakdown_eps = machine_eps(rdtype) * 10.0  # beta is a storage-dtype norm
    offset = jnp.asarray(cfg.eigenvalue_offset, np.dtype(rdtype))

    for _restart in range(max(cfg.max_restarts, 1)):
        while m_val < m_max:
            nb = m_val + 1  # process candidate row m_val, write residual at row nb
            basis, c, beta = _project_step(op, basis, defl, defl_mask, nb, offset)
            c_host = np.asarray(jax.device_get(c), host_c)
            beta_f = float(jax.device_get(beta))
            total_iters += 1
            m_val = nb

            t_host[: m_val, m_val - 1] = c_host[: m_val]
            t_host[m_val - 1, : m_val] = np.conj(c_host[: m_val])

            tk = t_host[: m_val, : m_val]
            tk = (tk + tk.conj().T) / 2
            evs_all = np.linalg.eigvalsh(tk)
            m_want = min(nroot, m_val)
            evs = evs_all[::-1][:m_want] if cfg.find_maximum else evs_all[:m_want]

            if beta_f < breakdown_eps:
                converged = True
                break
            if pevs is not None and pevs.shape[0] == evs.shape[0] and evs.shape[0] == nroot:
                diffs = np.abs(evs - pevs)
                tol = np.minimum(np.abs(evs), np.abs(pevs)) * cfg.eps
                if np.all(diffs < tol):
                    converged = True
                    break
            pevs = evs

        if converged or m_val >= n:
            converged = converged or m_val >= n
            break

        # --- thick restart: keep the l best Ritz vectors + the residual ----
        tk = t_host[:m_val, :m_val]
        tk = (tk + tk.conj().T) / 2
        theta, q = np.linalg.eigh(tk)
        sel = (
            list(range(m_val - 1, m_val - 1 - l_keep, -1))
            if cfg.find_maximum
            else list(range(l_keep))
        )
        q_keep = np.zeros((l_keep + 1, m_max + 1), dtype=host_c)
        q_keep[:l_keep, :m_val] = q[:, sel].T
        q_keep[l_keep, m_val] = 1.0  # the candidate residual row, already orthonormal
        basis_new = _rotate_basis(jnp.asarray(q_keep if is_complex_dtype(dtype) else q_keep.real, dtype), basis)
        basis = jnp.zeros((m_max + 1, n), dtype).at[: l_keep + 1].set(basis_new)

        t_host = np.zeros((m_max + 1, m_max + 1), dtype=host_c)
        t_host[np.arange(l_keep), np.arange(l_keep)] = theta[sel]
        # Couplings <y_i, A r> appear automatically when the next column is
        # projected; the symmetric fill happens in the loop above.
        m_val = l_keep
        # The kept Ritz values are *identical* across the restart boundary by
        # construction — comparing against pre-restart values would declare
        # convergence instantly.  Only in-cycle drift counts.
        pevs = None

    # Final Rayleigh-Ritz extraction from the current projected matrix.
    m_val = max(m_val, 1)
    tk = t_host[:m_val, :m_val]
    tk = (tk + tk.conj().T) / 2
    theta, q = np.linalg.eigh(tk)
    num_out = min(nroot, m_val)
    sel = [m_val - 1 - i for i in range(num_out)] if cfg.find_maximum else list(range(num_out))
    q_pad = np.zeros((num_out, m_max + 1), dtype=host_c)
    q_pad[:, :m_val] = q[:, sel].T
    vecs = _rotate_basis(jnp.asarray(q_pad if is_complex_dtype(dtype) else q_pad.real, dtype), basis)
    norms = jnp.sqrt(jnp.sum(jnp.abs(vecs) ** 2, axis=1, keepdims=True))
    eigvecs = vecs / norms

    eigenvalues = [float(theta[s]) - cfg.eigenvalue_offset for s in sel]
    return eigenvalues, eigvecs, total_iters, converged


def lanczos_run_thick(op, cfg: LanczosConfig, init_vector, dtype):
    """Thick-restart engine under the shared deflation driver (the engine
    restarts internally, so no warm-restart wrapper)."""
    from .lanczos import deflation_driver

    cfg = cfg.resolved(dtype)
    return deflation_driver(
        lambda v0, nroot, defl, mask: thick_lanczos_iteration(op, v0, nroot, defl, mask, cfg),
        cfg, init_vector, dtype, use_warm_restarts=False,
    )
