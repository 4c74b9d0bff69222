"""Chebyshev-filtered Lanczos solve: extremal eigenpairs at huge n.

``filtered_lanczos`` wraps the operator in a
:class:`~lanczos_tpu.ops.filters.ChebyshevFilterOperator`, runs the ordinary
(deflation-driven, thick-restart) engine on the FILTERED operator — where
the wanted mu-band is an exponentially separated top cluster, so the Krylov
basis stays tiny and reorthogonalization cost vanishes — and recovers the
A-space eigenvalues by a small subspace Rayleigh-Ritz over the converged
filtered Ritz vectors (df64 inner products on device, k x k host f64 solve).

Use when: n is large enough that basis traffic dominates (>= ~1e6), the
target is an extremal EDGE at coarse accuracy (eigenvalue error ~ mu), and
matvecs are cheap relative to basis sweeps (sparse/stencil operators).  The
flagship chain solve is the canonical case — see
experiments/tpu_flagship_cheby.py and BASELINE.md.  For reference-grade
(1e-13) tolerances use ``precise_vectors`` instead; for small n the plain
engines are faster (the filter costs degree matvecs per iteration).

No reference counterpart (the reference's only spectral transform is the
scalar ``eigenvalue_offset`` shift, lambda_lanczos.hpp:163-170; this is the
TPU-first generalization of that idea to a polynomial of the operator).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import linalg
from ..ops.filters import ChebyshevFilterOperator
from ..ops.operators import as_operator
from ..utils import estimate

__all__ = ["filtered_lanczos"]


def _safe_bound(op) -> float:
    try:
        return float(estimate.gershgorin_bound(op))
    except Exception:
        return float(estimate.power_bound(op))


def _edge_estimate(op, find_maximum: bool) -> float:
    """Cheap plain-Lanczos estimate of the WANTED spectral edge.

    Ritz values converge to the edge from INSIDE the spectrum, which is
    exactly the safe side for the filter window: an estimate above the true
    minimum leaves the true edge outside the damp window, where T_p is
    monotone and LARGER — separation only improves.  (The far side is the
    dangerous one; it gets the safe Gershgorin bound.)
    """
    from ..api import LambdaLanczos

    eng = LambdaLanczos(op, find_maximum=find_maximum, num_eigs=1)
    eng.eps = 1e-3
    eng.max_iteration = min(48, op.n)
    eng.max_restarts = 1
    val, _ = eng.run_one()
    return float(val)


def _spectrum_bounds(op, lo, hi, find_maximum: bool):
    """Target-side bound: tight edge estimate; far side: safe bound."""
    if lo is None:
        lo = _edge_estimate(op, False) if not find_maximum else -_safe_bound(op)
    if hi is None:
        hi = _safe_bound(op) if not find_maximum else _edge_estimate(op, True)
    return float(lo), float(hi)


def filtered_lanczos(op, num_eigs: int = 1, find_maximum: bool = False, *,
                     degree: int = 400, mu: float | None = None,
                     lo: float | None = None, hi: float | None = None,
                     guard: int = 0, configure=None):
    """(eigenvalues, eigenvectors, info) at the wanted spectral edge.

    Parameters mirror :class:`~lanczos_tpu.api.LambdaLanczos` where they
    overlap.  ``mu`` is the amplified band width and does double duty: it is
    the eigenvalue-error budget AND the window that must CONTAIN every
    wanted eigenvalue — a target outside [edge, edge+mu] is damped like the
    bulk and comes back as noise (its entry in ``info['residuals']`` is
    O(1); a warning fires).  Default ``2.5e-6 * (hi - lo)``, the f32
    production regime for a clustered edge.  ``degree`` is the filter
    polynomial degree (amplification grows like ``cosh(degree *
    sqrt(2*mu/e))``, so deeper filters buy fewer filtered iterations at
    more matvecs each; coerced even so both edges amplify positively).
    ``lo``/``hi`` default to a tight pre-pass estimate on the TARGET side
    and Gershgorin on the far side (the far side must never underestimate —
    an eigenvalue beyond the damp window is amplified exponentially).
    ``configure(engine)`` tweaks the B-space engine (e.g. ``block_size``)
    before it runs.  ``guard`` oversamples the B-space solve by that many
    extra eigenpairs and returns the best ``num_eigs`` after the final
    Rayleigh-Ritz — the last-converged pair of a deflation run is the
    noisiest, so ``guard=1`` trades ~one extra B-space round for a much
    tighter tail pair (measured: n=2^16 3rd-pair error 5e-10..7.6e-6
    run-to-run at guard=0).

    Returns ascending eigenvalues (row-layout eigenvectors, engine
    convention) and an ``info`` dict with the B-space iteration counts and
    the A-space residual norms.
    """
    from ..api import LambdaLanczos  # late import: api imports solvers

    op = as_operator(op)
    lo, hi = _spectrum_bounds(op, lo, hi, find_maximum)
    if mu is None:
        mu = 2.5e-6 * (hi - lo)
    # Even degree only: T_p is +cosh on BOTH sides outside the window for
    # even p, so the amplified band is a top cluster in B-space regardless
    # of which edge is targeted (odd p maps the bottom band to -cosh).
    degree = int(degree) + (int(degree) % 2)

    fop = ChebyshevFilterOperator.from_interval(
        op, degree, lo, hi, mu, find_maximum=find_maximum)

    # ``guard`` oversamples the B-space solve: the LAST-converged eigenpair
    # of a deflation run is the noisiest (it converges on the noise
    # timescale — measured at n=2^16/mu=1e-5 the 3rd-pair error ranges
    # 5e-10..7.6e-6 run-to-run at guard=0), and extra guard pairs push
    # that noise off the returned set: the final Rayleigh-Ritz spans
    # num_eigs+guard vectors and the best num_eigs are returned.  Same
    # trick as the block engine's candidate rows joining the final RR
    # (solvers/block_thick.py).  Cost: ~guard extra budget-capped B-space
    # deflation rounds.
    eng = LambdaLanczos(fop, find_maximum=True, num_eigs=num_eigs + max(int(guard), 0))
    # In B-space the band is a separated top cluster: a shallow basis and a
    # loose eps suffice (the A-space accuracy comes from mu + the final
    # Rayleigh-Ritz, not from B-space drift resolution).  At f32 large-n
    # the B-space eps never fires (drift noise), so every round runs to
    # this budget and WALL IS PROPORTIONAL TO max_restarts*max_iteration:
    # the measured flagship tradeoff (BASELINE.md round 4) is
    # max_restarts=2 -> 1.53x faster at ~6x the eigenvalue error (1.4e-6
    # vs 2.5e-7 on the n=4.19M chain, both under the mu-scale bar).  The
    # default stays 4 (quality-first); set it via ``configure`` when the
    # coarser error is acceptable.  At f64 small n eps fires early and the
    # budget is moot.
    eng.eps = 1e-4
    eng.max_iteration = 48
    eng.max_restarts = 4
    eng.restart_policy = "thick"
    if configure is not None:
        configure(eng)
    import warnings

    with warnings.catch_warnings():
        # B-space eps-convergence is NOT this solve's accuracy contract (the
        # A-space answer comes from the final Rayleigh-Ritz and the band
        # check below), and degenerate band copies routinely exhaust the
        # B-space deflation budget at f32 drift noise — that budget warning
        # is noise here.  Everything else still surfaces.
        warnings.filterwarnings(
            "ignore", message=".*exhausted the max_restarts/max_iteration budget.*"
        )
        vals_b, vecs = eng.run()

    # ---- A-space subspace Rayleigh-Ritz over the returned vectors --------
    # The B-space Ritz values are useless as A eigenvalues (the filter is
    # not invertible on the band at f32 resolution); project A onto the
    # small converged subspace instead.  df64 inner products keep the k x k
    # projections at ~2^-45 even though the vectors are f32.
    V = jnp.asarray(vecs)
    k = V.shape[0]
    AV = jnp.stack([op.matvec(V[i]) for i in range(k)])
    S = np.zeros((k, k), np.float64)
    G = np.zeros((k, k), np.float64)
    for i in range(k):
        for j in range(k):
            s_hi, s_lo = linalg.inner_prod_df(V[i], AV[j])
            g_hi, g_lo = linalg.inner_prod_df(V[i], V[j])
            S[i, j] = float(s_hi) + float(s_lo)
            G[i, j] = float(g_hi) + float(g_lo)
    S = 0.5 * (S + S.T)
    G = 0.5 * (G + G.T)
    import scipy.linalg as sla

    theta, Y = sla.eigh(S, G)
    order = np.argsort(theta) if not find_maximum else np.argsort(theta)[::-1]
    theta = theta[order][:num_eigs]
    Y = Y[:, order][:, :num_eigs]
    vecs_out = jnp.asarray(Y.T.astype(np.float64), V.dtype) @ V
    norms = jnp.sqrt(jnp.sum(jnp.abs(vecs_out) ** 2, axis=1, keepdims=True))
    vecs_out = vecs_out / norms

    res = []
    for i in range(vecs_out.shape[0]):
        r = op.matvec(vecs_out[i]) - jnp.asarray(theta[i], vecs_out.dtype) * vecs_out[i]
        res.append(float(jnp.linalg.norm(r)))
    # Scale-free band check: the damped bulk satisfies |T_p| <= 1, so a
    # returned vector whose B-space Ritz value is not well above 1 never
    # lived in the amplified band — its A-space value is bulk noise.
    # (A weak-but-valid filter can sit at e.g. 1.9 — the flagship p=400
    # regime — so the cut is just above the bulk ceiling, not at "well
    # amplified".)
    # Guard pairs are EXPECTED to be the noisiest — only the best num_eigs
    # (engine order: best first) gate the warning; a bulk-level guard is
    # exactly the oversampling working as intended.
    vals_b = [float(v) for v in np.asarray(vals_b)]
    if any(v < 1.1 for v in vals_b[:num_eigs]):
        import warnings

        warnings.warn(
            f"filtered_lanczos: B-space Ritz values {[f'{v:.2g}' for v in vals_b]} "
            f"include entries at the damped-bulk level (|T_p| <= 1) — some wanted "
            f"eigenvalues likely lie OUTSIDE the amplified mu-band; raise mu to "
            f"cover the wanted spread (mu={mu:g}), raise degree for more "
            f"amplification, or lower num_eigs (check info['residuals'])",
            stacklevel=2,
        )
    # ``theta`` is already in engine order (best first: ascending when
    # minimizing, descending when maximizing — EigenPairManager semantics).
    vals = [float(t) for t in theta]
    info = {
        "iteration_counts": list(eng.iteration_counts),
        "filter_degree": degree,
        "mu": mu,
        "interval": (lo, hi),
        "residuals": res,
        "matvecs": int(sum(eng.iteration_counts)) * degree * max(int(eng.block_size), 1),
    }
    return np.asarray(vals), vecs_out, info
