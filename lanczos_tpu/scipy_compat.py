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

__all__ = ["eigsh", "expm_multiply", "minres"]


def _as_engine_operand(a):
    if isinstance(a, LinearOperator):
        return a
    try:  # scipy.sparse matrix
        import scipy.sparse as sp

        if sp.issparse(a):
            if np.iscomplexobj(a):
                return _herm_embed_dense(a.toarray())
            from .ops.operators import CSROperator

            return CSROperator.from_scipy(a)
    except ImportError:  # pragma: no cover
        pass
    a = np.asarray(a) if not hasattr(a, "dtype") else a
    if np.iscomplexobj(a):
        # Complex Hermitian input (the reference accepts these natively,
        # lambda_lanczos.hpp template T): route through the real 2n
        # embedding — complex dtypes are unsupported on TPU runtimes, and
        # the engines/facades all dispatch HermitianSplitOperator.
        return _herm_embed_dense(np.asarray(a))
    return jnp.asarray(a)


def _herm_embed_dense(h):
    from .ops.hermitian_split import HermitianSplitOperator
    from .ops.operators import DenseOperator

    h = np.asarray(h)
    if h.ndim != 2 or h.shape[0] != h.shape[1]:
        raise ValueError(f"operator must be square, got shape {h.shape}")
    if not np.allclose(h, h.conj().T, rtol=0.0,
                       atol=1e-6 * max(1.0, float(np.abs(h).max()))):
        raise ValueError("complex input must be Hermitian (A == A.conj().T)")
    n = h.shape[0]
    if h.dtype.itemsize <= 8:  # complex64: f32 parts
        return HermitianSplitOperator(
            DenseOperator(jnp.asarray(np.real(h), np.float32), n),
            DenseOperator(jnp.asarray(np.imag(h), np.float32), n),
        )
    # complex128: df64 word pairs — full f64 entry fidelity even on an
    # x64-disabled runtime (a plain jnp.asarray(float64) silently
    # truncates there), and the precise/pv paths get exact matvec_df.
    from .ops.operators import DenseDFOperator

    return HermitianSplitOperator(
        DenseDFOperator.from_f64(np.ascontiguousarray(np.real(h))),
        DenseDFOperator.from_f64(np.ascontiguousarray(np.imag(h))),
    )


def _one_end(operand, k, find_maximum, v0, maxiter, tol, engine_kwargs, *, want_vecs: bool = True):
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
    if not want_vecs:
        # Skip the (k, n) device->host transfer entirely (~2.6 MB/s through
        # the remote-TPU tunnel — ~100 MB of pointless download at n=4M).
        return np.asarray(vals), None
    return np.asarray(vals), np.asarray(vecs)


def eigsh(a, k: int = 6, *, which: str = "LM", v0=None, maxiter=None, tol=None, return_eigenvectors: bool = True, sigma=None, method: str = "auto", **engine_kwargs):
    """Drop-in for ``scipy.sparse.linalg.eigsh`` (symmetric/Hermitian).

    ``which``: 'LM' (largest magnitude — scipy's default; solves both ends
    and keeps the k largest |lambda|), 'LA' (largest algebraic), 'SA'
    (smallest algebraic), 'BE' (both ends: k//2 from each end, one extra
    from the high end when k is odd — scipy's split), or 'SM' (smallest
    magnitude — delegated to shift-invert at sigma=0, the standard route:
    the plain-Lanczos SM scipy warns about is hopeless for interior
    eigenvalues anyway; singular A makes the inner solves singular exactly
    like scipy's factorization).

    ``sigma`` enables shift-invert mode: eigenvalues near an INTERIOR
    ``sigma`` via Lanczos on ``(A - sigma I)^{-1}``, with the inverse
    applied matrix-free by an inner MINRES solve
    (:class:`~lanczos_tpu.ops.operators.ShiftInvertOperator` — a
    factorization is impossible for a matrix-free backend).  ``which`` then
    follows scipy's shift-invert semantics on the transformed spectrum
    theta = 1/(lambda - sigma): 'LM' (default sense: nearest ``sigma``),
    'LA' (just above), 'SA' (just below).  ``inner_tol``/``inner_maxiter``
    bound the inner solves; sigma exactly AT an eigenvalue makes the inner
    system singular (scipy's factorization fails the same way).

    Extra keyword arguments are set as attributes on the underlying
    :class:`~lanczos_tpu.api.LambdaLanczos` engine (e.g.
    ``restart_policy='thick'``, ``eigenvalue_offset=-4.0``,
    ``precise_vectors=True``).
    Returns ``(w, v)`` with scipy's column-vector convention ``v[:, i]``
    (or just ``w`` when ``return_eigenvectors=False``).
    """
    if method not in ("auto", "filtered"):
        raise ValueError("method must be 'auto' (Lanczos engines / shift-invert) or 'filtered' (Chebyshev-filtered solve)")
    from .ops.hermitian_split import HermitianSplitOperator

    operand0 = _as_engine_operand(a)
    if isinstance(operand0, HermitianSplitOperator):
        # complex Hermitian input (auto-embedded): fold doubled pairs back
        # to k complex eigenpairs
        if sigma is not None:
            raise NotImplementedError(
                "sigma= shift-invert is not supported for complex Hermitian "
                "input yet; shift the operator (A - sigma*I) yourself or "
                "work with the real embedding directly")
        return _eigsh_hermitian(
            operand0, int(k), which, maxiter, tol, return_eigenvectors,
            engine_kwargs, method)
    if method == "filtered":
        return _eigsh_filtered(
            a, int(k), which, sigma, tol, return_eigenvectors, engine_kwargs)
    if sigma is not None or which == "SM":
        sig = float(sigma) if sigma is not None else 0.0
        sense = which if sigma is not None else "LM"
        # The MINRES shift-invert accuracy is capped by the f32 inner-solve
        # floor (~1e-6 relative; BASELINE.md) — a tight tolerance request
        # CANNOT be met there but CAN by the filtered interior mode (no
        # linear solves, and sigma ON an eigenvalue — fatal for MINRES —
        # is its best-conditioned case).  Route tight-tol nearest-sigma
        # requests to it when the operator carries the df path; explicit
        # inner_* kwargs opt back into MINRES (VERDICT r4 weak item 5).
        tight = tol is None or tol == 0 or (0 < tol <= 1e-8)
        explicit_minres = any(kk in engine_kwargs for kk in ("inner_tol", "inner_maxiter"))
        if tight and sense == "LM" and not explicit_minres:
            try:
                return _eigsh_filtered(
                    a, int(k), "LM", sig, tol, return_eigenvectors,
                    engine_kwargs)
            except (TypeError, NotImplementedError):
                pass  # operator lacks a usable df path: MINRES below
        if tight:
            import warnings

            from .diagnostics import AccuracyWarning

            warnings.warn(
                "eigsh shift-invert (MINRES): the requested tolerance is "
                "below the f32 inner-solve floor (~1e-6 relative); use "
                "method='filtered' (or which='LM' with a df-capable "
                "operator, which auto-routes) for reference-grade interior "
                "accuracy",
                AccuracyWarning,
                stacklevel=2,
            )
        return _eigsh_shift_invert(
            a, int(k), sig, sense, v0, maxiter, tol,
            return_eigenvectors, engine_kwargs,
        )
    if which not in ("LM", "LA", "SA", "BE"):
        raise ValueError(
            "which must be 'LM' (largest magnitude), 'LA' (largest algebraic), "
            "'SA' (smallest algebraic), 'BE' (both ends) or 'SM' (smallest "
            "magnitude, via shift-invert at 0)"
        )
    operand = _as_engine_operand(a)
    wv = bool(return_eigenvectors)
    if which == "LM":
        # largest |lambda| of a symmetric matrix lives at one of the two
        # spectrum ends: solve k from each end and keep the k biggest
        k = int(k)
        w_hi, v_hi = _one_end(operand, k, True, v0, maxiter, tol, dict(engine_kwargs), want_vecs=wv)
        w_lo, v_lo = _one_end(operand, k, False, v0, maxiter, tol, dict(engine_kwargs), want_vecs=wv)
        w = np.concatenate([w_lo, w_hi])
        keep = np.argsort(np.abs(w))[::-1][:k]
        if wv:
            vecs = np.concatenate([v_lo, v_hi], axis=0)[keep]
        w = w[keep]
    elif which == "BE":
        k = int(k)
        k_hi = k - k // 2  # scipy: the extra one comes from the high end
        k_lo = k // 2
        w_hi, v_hi = _one_end(operand, k_hi, True, v0, maxiter, tol, engine_kwargs, want_vecs=wv)
        w_lo, v_lo = (np.zeros(0), None) if k_lo == 0 else _one_end(
            operand, k_lo, False, v0, maxiter, tol, engine_kwargs, want_vecs=wv
        )
        w = np.concatenate([w_lo, w_hi])
        if wv:
            if v_lo is None:
                v_lo = np.zeros((0, v_hi.shape[1]))
            vecs = np.concatenate([v_lo, v_hi], axis=0)
    else:
        w, vecs = _one_end(operand, k, which == "LA", v0, maxiter, tol, engine_kwargs, want_vecs=wv)
    # scipy returns ascending eigenvalues for every `which`.
    order = np.argsort(w)
    w = w[order]
    if not return_eigenvectors:
        return w
    return w, vecs[order].T  # scipy column convention


def _eigsh_hermitian(emb, k, which, maxiter, tol, return_eigenvectors,
                     engine_kwargs, method):
    """eigsh for a complex Hermitian operator via the real embedding.

    Tight/default tolerances go through
    ``solve_hermitian(method='filtered', precise=True)`` (df-floor values
    and vectors); loose tolerances use the plain embedded Lanczos engine.
    Returns scipy's ascending values + complex column vectors.
    """
    from .ops.hermitian_split import solve_hermitian

    tight = tol is None or tol == 0 or (0 < float(tol) <= 1e-8)
    use_filtered = method == "filtered" or tight

    def cfg(eng):
        if maxiter is not None:
            eng.max_iteration = int(maxiter)
        if tol is not None and tol > 0:
            eng.eps = float(tol)
        for key, val in engine_kwargs.items():
            if not hasattr(eng, key):
                raise TypeError(f"unknown engine option {key!r}")
            setattr(eng, key, val)

    def solve(kk, find_max):
        if use_filtered:
            return solve_hermitian(
                emb.op_r, emb.op_i, num_eigs=kk, find_maximum=find_max,
                method="filtered", precise=tight, configure=cfg)
        return solve_hermitian(
            emb.op_r, emb.op_i, num_eigs=kk, find_maximum=find_max,
            configure=cfg)

    k = int(k)
    if which in ("LA", "SA"):
        w, v = solve(k, which == "LA")
    elif which == "LM":
        w_hi, v_hi = solve(k, True)
        w_lo, v_lo = solve(k, False)
        w = np.concatenate([w_lo, w_hi])
        v = np.concatenate([v_lo, v_hi], axis=0)
        keep = np.argsort(np.abs(w))[::-1][:k]
        w, v = w[keep], v[keep]
    elif which == "BE":
        k_hi = k - k // 2
        k_lo = k // 2
        w_hi, v_hi = solve(k_hi, True)
        if k_lo:
            w_lo, v_lo = solve(k_lo, False)
        else:
            w_lo, v_lo = np.zeros(0), np.zeros((0, v_hi.shape[1]), v_hi.dtype)
        w = np.concatenate([w_lo, w_hi])
        v = np.concatenate([v_lo, v_hi], axis=0)
    else:
        raise ValueError(
            "which must be 'LM', 'LA', 'SA' or 'BE' for complex Hermitian "
            "input ('SM' needs shift-invert, unsupported on the embedding)")
    order = np.argsort(w)
    w = np.asarray(w)[order]
    if not return_eigenvectors:
        return w
    return w, np.asarray(v)[order].T


def _eigsh_filtered(a, k, which, sigma, tol, return_eigenvectors, engine_kwargs):
    """eigsh via the Chebyshev-filtered solve (``method='filtered'``).

    The round-4 fast path (BASELINE.md): fully automatic windowing, and
    ``tol`` <= 1e-8 (or scipy's tol=0 = machine precision, i.e. ``tol``
    None/0) selects ``precise=True`` — the spectral inverse-map refinement
    whose eigenvalues land at ~1e-14 in ~1/100th the shift-invert wall.
    ``sigma`` uses the squared-transform interior mode (no linear solves;
    sigma ON an eigenvalue is fine — the case that breaks shift-invert).
    Engine keyword arguments are applied to the filtered B-space engine
    via ``configure`` (unknown names raise, like the plain path).
    """
    from .solvers.filtered import filtered_lanczos

    operand = _as_engine_operand(a)
    precise = tol is None or float(tol) <= 1e-8

    def cfg(eng):
        for key, val in engine_kwargs.items():
            if not hasattr(eng, key):
                raise TypeError(f"unknown engine option {key!r}")
            setattr(eng, key, val)

    def one_end(kk, find_max):
        # auto_window=True: the static coarse default band is calibrated
        # for a clustered edge and can MISS the 2nd+ requested state on a
        # well-separated spectrum (measured: BE on dense random returned a
        # value off by the span scale); the scout sizes the band to the
        # requested states' measured spread.
        vals, vecs, _info = filtered_lanczos(
            operand, kk, find_max, precise=precise, auto_window=True,
            configure=cfg)
        return np.asarray(vals, np.float64), np.asarray(vecs)

    wv = bool(return_eigenvectors)
    if sigma is not None or which == "SM":
        if sigma is not None and which not in ("LM",):
            # scipy's shift-invert which='LA'/'SA' select "just above/below
            # sigma" on the transformed spectrum; the filtered interior
            # mode only implements nearest-sigma (the 'LM' sense) — fail
            # loudly instead of silently changing semantics.
            raise ValueError(
                "method='filtered' with sigma supports which='LM' (nearest "
                "sigma) only; use method='auto' for the 'LA'/'SA' "
                "shift-invert senses")
        sig = float(sigma) if sigma is not None else 0.0
        vals, vecs, _info = filtered_lanczos(
            operand, k, sigma=sig, precise=precise, configure=cfg)
        w = np.asarray(vals, np.float64)
        vecs = np.asarray(vecs)
    elif which == "LM":
        w_hi, v_hi = one_end(k, True)
        w_lo, v_lo = one_end(k, False)
        w = np.concatenate([w_lo, w_hi])
        keep = np.argsort(np.abs(w))[::-1][:k]
        vecs = np.concatenate([v_lo, v_hi], axis=0)[keep]
        w = w[keep]
    elif which == "BE":
        k_hi = k - k // 2
        k_lo = k // 2
        w_hi, v_hi = one_end(k_hi, True)
        if k_lo:
            w_lo, v_lo = one_end(k_lo, False)
        else:
            w_lo, v_lo = np.zeros(0), np.zeros((0, v_hi.shape[1]))
        w = np.concatenate([w_lo, w_hi])
        vecs = np.concatenate([v_lo, v_hi], axis=0)
    elif which in ("LA", "SA"):
        w, vecs = one_end(k, which == "LA")
    else:
        raise ValueError(
            "which must be 'LM', 'LA', 'SA', 'BE' or 'SM' for method='filtered'")
    order = np.argsort(w)
    w = w[order]
    if not return_eigenvectors:
        return w
    return w, np.asarray(vecs)[order].T  # scipy column convention


def _eigsh_shift_invert(a, k, sigma, which, v0, maxiter, tol, return_eigenvectors, engine_kwargs):
    """eigsh in shift-invert mode (scipy semantics on theta = 1/(lambda-sigma)):
    'LM' = nearest sigma (both extremes of theta merged by |theta|),
    'LA' = just above sigma, 'SA' = just below."""
    from .ops.operators import ShiftInvertOperator, as_operator

    if which not in ("LM", "LA", "SA"):
        raise ValueError("with sigma, which must be 'LM' (nearest), 'LA' (above) or 'SA' (below)")
    base = _as_engine_operand(a)
    if not isinstance(base, LinearOperator):
        base = as_operator(base)
    inner_tol = engine_kwargs.pop("inner_tol", None)
    inner_maxiter = engine_kwargs.pop("inner_maxiter", None)
    if inner_tol is None:
        from .core.types import machine_eps

        inner_tol = float(machine_eps(base.dtype)) * 100.0
    if inner_maxiter is None:
        # MINRES finishes in <= n steps only in exact arithmetic; interior
        # shifts are ill-conditioned and commonly need a few n in floats.
        inner_maxiter = min(4 * int(base.n), 10_000)
    from .core.types import real_dtype

    op = ShiftInvertOperator(
        base, jnp.asarray(sigma, np.dtype(real_dtype(base.dtype))), inner_tol, int(inner_maxiter)
    )

    def _thetas(find_maximum, kk):
        th, vecs = _one_end(op, kk, find_maximum, v0, maxiter, tol, dict(engine_kwargs))
        keep = np.abs(th) > 0
        return th[keep], vecs[keep]

    if which == "LM":
        th_hi, v_hi = _thetas(True, k)
        th_lo, v_lo = _thetas(False, k)
        th = np.concatenate([th_hi, th_lo])
        vecs = np.concatenate([v_hi, v_lo], axis=0)
        # Dedup (a theta extreme can appear in both runs) by EIGENVECTOR
        # overlap alone: the same physical pair from the two runs agrees in
        # theta only to the engine eps (~1e-5 at f32) — any fixed theta
        # tolerance either merges distinct pairs or keeps duplicates.  A
        # duplicate's vectors are parallel (overlap ~1); genuinely distinct
        # pairs — including two members of a degenerate cluster — are
        # near-orthogonal.
        order = np.argsort(-np.abs(th))
        th, vecs = th[order], vecs[order]
        uniq = []
        for i in range(th.shape[0]):
            if all(abs(np.vdot(vecs[i], vecs[j])) < 0.9 for j in uniq):
                uniq.append(i)
            if len(uniq) == k:
                break
        th, vecs = th[uniq], vecs[uniq]
    else:
        th, vecs = _thetas(which == "LA", k)
        th, vecs = th[:k], vecs[:k]

    w = sigma + 1.0 / th
    order = np.argsort(w)
    w, vecs = w[order], vecs[order]

    # A-posteriori check against the TRUE operator: the inner MINRES result
    # carries no error signal through the outer engine (an inner solve that
    # hit inner_maxiter feeds a silently-wrong inverse), so verify each pair
    # at the end — one base matvec each.
    scale = float(np.max(np.abs(w))) if w.size else 1.0
    eff_tol = max(float(tol) if tol else 0.0, np.sqrt(inner_tol)) * max(scale, 1.0)
    bad = []
    for i in range(w.shape[0]):
        v_i = jnp.asarray(vecs[i], base.dtype)
        r = np.asarray(base.matvec(v_i)) - w[i] * vecs[i]
        if np.linalg.norm(r) > eff_tol:
            bad.append((float(w[i]), float(np.linalg.norm(r))))
    if bad:
        import warnings

        from .diagnostics import AccuracyWarning

        warnings.warn(
            f"shift-invert eigsh: {len(bad)} eigenpair(s) have residuals above "
            f"{eff_tol:.1e} (worst {max(b for _, b in bad):.1e}) — the inner MINRES "
            "solves likely hit inner_maxiter; raise inner_maxiter or loosen sigma",
            AccuracyWarning,
            stacklevel=3,
        )
    if not return_eigenvectors:
        return w
    return w, vecs.T


def _expm_multiply_chebyshev(expo, b, t, start, stop, num, endpoint):
    """expm_multiply through the whole-evolution Chebyshev chain."""
    def one_vec(vec, ts):
        vr = np.ascontiguousarray(np.real(vec))
        vi = np.ascontiguousarray(np.imag(vec)) if np.iscomplexobj(vec) else np.zeros_like(vr)
        if ts is None:
            (o_re, o_im), _ = expo.run_chebyshev(t, vr, vi)
            out = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
            return out if np.iscomplexobj(vec) else np.real(out)
        (g_re, g_im), _ = expo.run_chebyshev_grid(list(ts), vr, vi)
        out = np.asarray(g_re, np.float64) + 1j * np.asarray(g_im, np.float64)
        return out if np.iscomplexobj(vec) else np.real(out)

    if start is not None or stop is not None or num is not None:
        if start is None or stop is None or num is None:
            raise ValueError("time grids need start, stop and num together (scipy semantics)")
        ts = np.linspace(float(start), float(stop), int(num),
                         endpoint=True if endpoint is None else bool(endpoint))
        if b.ndim == 1:
            return one_vec(b, ts)
        return np.stack([one_vec(b[:, j], ts) for j in range(b.shape[1])], axis=-1)
    if b.ndim == 1:
        return one_vec(b, None)
    return np.stack([one_vec(b[:, j], None) for j in range(b.shape[1])], axis=-1)


def minres(a, b, *, x0=None, shift: float = 0.0, rtol: float = 1e-5, maxiter=None, tol=None):
    """Drop-in for ``scipy.sparse.linalg.minres``: solve
    ``(A - shift I) x = b`` for symmetric/Hermitian A (indefinite-safe).

    Returns ``(x, info)`` with scipy's convention: info 0 = converged to
    ``rtol``, info >0 = iteration count at which maxiter stopped it.
    Backed by the jittable device loop :func:`lanczos_tpu.solvers.minres.minres`.
    ``tol`` is accepted as a deprecated alias of ``rtol`` (scipy <1.12).
    """
    from .ops.operators import LinearOperator, as_operator
    from .solvers.minres import minres as _minres

    op = _as_engine_operand(a)
    if not isinstance(op, LinearOperator):
        op = as_operator(op)
    if tol is not None:
        rtol = tol
    if maxiter is None:
        maxiter = 5 * int(op.n)
    b = jnp.asarray(b, op.dtype)
    x0 = jnp.asarray(x0, op.dtype) if x0 is not None else None
    x, relres, iters = _minres(op, b, shift=shift, tol=rtol, maxiter=int(maxiter), x0=x0)
    info = 0 if float(relres) <= rtol else int(iters)
    return np.asarray(x), info


def expm_multiply(a, b, *, t: float = 1.0, start=None, stop=None, num=None, endpoint=None, method: str = "auto", **engine_kwargs):
    """Drop-in for ``scipy.sparse.linalg.expm_multiply(A, B)``.

    Single point: ``exp(t*A) @ B`` for a vector or a (n, m) block.
    Time grid (scipy's start/stop/num/endpoint): returns the stacked
    ``exp(t_i*A) @ B`` with shape (num, n) for a vector b or (num, n, m)
    for a block — computed from ONE Krylov build per input vector (time
    enters only through host-side coefficients).

    ``method='chebyshev'`` evaluates through the Chebyshev propagator
    instead (solvers/cheby_expm.py): the whole evolution — or the whole
    time GRID — from ONE ~|t*e|-term matvec chain with no Krylov basis at
    all (measured: n=2^20 t=50 in 0.17 s vs 1.3-1.4 s Krylov; BASELINE.md
    round 4).  Real operators; complex ``b`` handled split.

    Extra keyword arguments configure the underlying
    :class:`~lanczos_tpu.api.Exponentiator`.
    """
    if method not in ("auto", "chebyshev"):
        raise ValueError("method must be 'auto' (Krylov) or 'chebyshev'")
    expo = Exponentiator(_as_engine_operand(a))
    for key, val in engine_kwargs.items():
        if not hasattr(expo, key):
            raise TypeError(f"unknown engine option {key!r}")
        setattr(expo, key, val)
    b = np.asarray(b)
    if method == "chebyshev":
        return _expm_multiply_chebyshev(expo, b, t, start, stop, num, endpoint)
    from .ops.hermitian_split import HermitianSplitOperator

    herm = isinstance(expo.operator, HermitianSplitOperator)

    def coerce(vec):
        # complex Hermitian operand (auto-embedded): the facades take the
        # ORIGINAL n-dim complex state raw — casting to expo.dtype (real)
        # would crush the imaginary part
        return vec if herm else jnp.asarray(vec, expo.dtype)

    if start is not None or stop is not None or num is not None:
        if start is None or stop is None or num is None:
            raise ValueError("time grids need start, stop and num together (scipy semantics)")
        ts = np.linspace(float(start), float(stop), int(num), endpoint=True if endpoint is None else bool(endpoint))
        if b.ndim == 1:
            outs, _ = expo.run_grid(list(ts), coerce(b))
            return np.asarray(outs)
        cols = [np.asarray(expo.run_grid(list(ts), coerce(b[:, j]))[0]) for j in range(b.shape[1])]
        return np.stack(cols, axis=-1)  # (num, n, m)
    if b.ndim == 1:
        out, _ = expo.run(t, coerce(b))
        return np.asarray(out)
    outs, _ = expo.run_batch(t, coerce(b.T))  # columns -> batch rows
    return np.asarray(outs).T
