"""precise_vectors x thick restart: bounded memory at reference-grade accuracy.

Round-2 state: df64 Krylov vectors (`precise_vectors`) reached 2.1e-14 on chip
but ONLY with an unbounded basis (plain fused engine), while the bounded-
memory thick-restart engine floored at ~1e-6 — reference-grade accuracy and
bounded memory were mutually exclusive (VERDICT r2, "what's weak" #1).  These
tests pin the merged engine (solvers/thick_restart.thick_lanczos_iteration_
fused_pv): f32 storage, a basis capped far below the problem size, eigenvalue
errors at the reference's f64-tolerance regime (reference bar:
lambda_lanczos.hpp:150 eps ~ 2.2e-13; the 1e-14 zoo entries,
lambda_lanczos_test.cpp:290, :519, :739).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from lanczos_tpu import LambdaLanczos
from lanczos_tpu.ops.operators import DIAOperator


def _block_chain_op(n: int, nb: int, dtype=np.float32):
    """Block-diagonal hopping chain: n/nb independent copies of the nb-site
    chain, so every chain eigenvalue has multiplicity n/nb — a genuinely
    degenerate clustered spectrum with analytic truth."""
    off = np.ones(n - 1)
    off[nb - 1 :: nb] = 0.0  # cut couplings at block boundaries
    diags = np.zeros((2, n))
    diags[0, 1:] = off  # offset -1: A[i, i-1]
    diags[1, : n - 1] = off  # offset +1: A[i, i+1]
    op = DIAOperator.from_diagonals([-1, 1], jnp.asarray(-diags, dtype), n)
    evs = np.sort(-2.0 * np.cos(np.pi * np.arange(1, nb + 1) / (nb + 1)))
    return op, evs


def test_pv_thick_degenerate_bounded_basis():
    """Multiplicity-4 degenerate lowest eigenvalue, basis capped at 48 rows
    (n=512): three copies via deflation rounds, each at <=1e-10 — the f32
    thick engine floors ~1e-6 here."""
    n, nb = 512, 128
    op, chain_evs = _block_chain_op(n, nb)
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3, dtype=np.float32, mode="fused")
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.max_iteration = 48
    eng.eps = 1e-12
    eng.eigenvalue_offset = -4.0
    vals, vecs = eng.run()
    truth = np.full(3, chain_evs[0])  # multiplicity 4 >= 3 requested
    err = np.max(np.abs(np.sort(np.asarray(vals)) - truth))
    assert err < 1e-10, err
    # Every deflation round must converge inside the restart budget (the
    # protected err_est gate; budget-exhausted rounds would warn).
    assert eng.stats.unconverged_rounds == 0


def test_pv_thick_distinct_cluster_bounded_basis():
    """Three distinct eigenvalues separated by ~3e-7 relative — unresolvable
    in plain f32 — extracted in one round at ~1e-13 with a 64-row basis."""
    n = 2048
    d = np.linspace(2.0, 6.0, n)
    d[0], d[1], d[2] = 1.0, 1.0 + 3e-7, 1.0 + 7e-7
    diag = d.astype(np.float32)
    op = DIAOperator.from_diagonals([0], jnp.asarray(diag[None, :]), n)
    truth = np.sort(diag.astype(np.float64))[:3]

    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3, dtype=np.float32, mode="fused")
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.max_iteration = 64
    eng.eps = 1e-12
    vals, _ = eng.run()
    err = np.max(np.abs(np.sort(np.asarray(vals)) - truth))
    assert err < 1e-10, err


def test_pv_thick_matches_pv_plain_on_chain():
    """Same chain, same tolerance: the bounded-basis pv thick engine and the
    unbounded-plain pv engine agree with the analytic spectrum."""
    n = 256
    op = DIAOperator.from_diagonals(
        [-1, 1], [np.full(n, -1.0, np.float32), np.full(n, -1.0, np.float32)], n
    )
    exact = np.sort(-2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1)))[:2]

    eng = LambdaLanczos(op, find_maximum=False, num_eigs=2, dtype=np.float32)
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.max_iteration = 40  # well below the plain engine's exhaustion depth
    eng.eps = 1e-13
    eng.eigenvalue_offset = -4.0
    vals, vecs = eng.run()
    err = np.max(np.abs(np.sort(np.asarray(vals)) - exact))
    assert err < 1e-11, err
    # Residual check: the returned vectors are f32-floor quality (the df64
    # win is in the VALUES); a-posteriori residuals stay near the f32 floor.
    res = eng.residuals(vals, vecs)
    assert max(res) < 1e-4


def test_pv_block_thick_degenerate():
    """pv x BLOCK thick restart: width-3 block captures three copies of the
    multiplicity-4 lowest eigenvalue in ~2 deflation rounds (scalar pv needs
    one round per copy) at reference-grade accuracy from a bounded basis."""
    n, nb = 512, 128
    op, chain_evs = _block_chain_op(n, nb)
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3, dtype=np.float32, mode="fused")
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.block_size = 3
    eng.max_iteration = 96
    eng.max_restarts = 32
    eng.eps = 1e-12
    eng.eigenvalue_offset = -4.0
    vals, vecs = eng.run()
    truth = np.full(3, chain_evs[0])
    err = np.max(np.abs(np.sort(np.asarray(vals)) - truth))
    assert err < 1e-10, err
    assert eng.stats.unconverged_rounds == 0
    # The block advantage: the whole triple in at most 3 deflation rounds.
    assert len(eng.iteration_counts) <= 3


def test_pv_block_thick_matches_scalar_pv():
    """Distinct close cluster: pv block (b=2) agrees with the analytic truth
    at the same tolerance the scalar pv engine reaches."""
    n = 1024
    d = np.linspace(2.0, 6.0, n).astype(np.float32)
    d[0], d[1], d[2] = 1.0, 1.0 + 3e-7, 1.0 + 7e-7
    op = DIAOperator.from_diagonals([0], jnp.asarray(d[None, :]), n)
    truth = np.sort(d.astype(np.float64))[:3]
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3, dtype=np.float32, mode="fused")
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.block_size = 2
    eng.max_iteration = 64
    eng.max_restarts = 64
    eng.eps = 1e-12
    vals, _ = eng.run()
    err = np.max(np.abs(np.sort(np.asarray(vals)) - truth))
    assert err < 1e-10, err


def test_pv_block_warm_still_fenced():
    """precise_vectors + block requires the thick engine; the plain block
    engine remains an explicit error."""
    a = np.eye(16, dtype=np.float32)
    eng = LambdaLanczos(jnp.asarray(a), dtype=np.float32)
    eng.precise_vectors = True
    eng.block_size = 2  # restart_policy stays 'warm'
    with pytest.raises(ValueError):
        eng.run()


def test_pv_with_coo_operator():
    """COO (the portable sparse format) carries pv via the f64-reduction
    matvec_df — the chain zoo entry at reference tolerance."""
    from lanczos_tpu import COOOperator

    n = 256
    i = np.arange(n - 1)
    rows = np.concatenate([i, i + 1])
    cols = np.concatenate([i + 1, i])
    vals = np.full(2 * (n - 1), -1.0, np.float32)
    op = COOOperator.from_arrays(rows, cols, vals, n)
    exact = np.sort(-2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1)))[:2]

    eng = LambdaLanczos(op, find_maximum=False, num_eigs=2, dtype=np.float32)
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.max_iteration = 40
    eng.max_restarts = 64
    eng.eps = 1e-12
    eng.eigenvalue_offset = -4.0
    vals_out, _ = eng.run()
    err = np.max(np.abs(np.sort(np.asarray(vals_out)) - exact))
    assert err < 1e-10, err


def test_pv_thick_sharded_dia_mesh():
    """precise_vectors over the 8-device mesh: ShardedDIAOperator's df64
    halo matvec + GSPMD df reductions reach reference-grade values on the
    multi-chip path (the halo moves both words — still O(max|offset|)
    elements per neighbor)."""
    import jax

    from lanczos_tpu.parallel.mesh import make_mesh
    from lanczos_tpu.parallel.sharded import ShardedDIAOperator

    mesh = make_mesh(jax.devices()[:8])
    n = 256
    op = ShardedDIAOperator.from_diagonals(
        [-1, 1], [np.full(n, -1.0, np.float32), np.full(n, -1.0, np.float32)], n, mesh
    )
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=1, dtype=np.float32, mode="fused")
    eng.precise_vectors = True
    eng.restart_policy = "thick"
    eng.max_iteration = 40
    eng.max_restarts = 64
    eng.eps = 1e-11
    eng.eigenvalue_offset = -4.0
    vals, _ = eng.run()
    exact = -2.0 * np.cos(np.pi / (n + 1))
    assert abs(float(vals[0]) - exact) < 1e-9


def test_pv_complex_hermitian_via_split():
    """precise_vectors for a COMPLEX Hermitian problem through the real
    embedding (the documented pv route for complex dtypes): the reference's
    Hermitian zoo matrix solved to ~1e-12 in f32 storage."""
    from lanczos_tpu import DenseOperator
    from lanczos_tpu.ops.hermitian_split import solve_hermitian

    hr = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    hi = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 1.0], [0.0, -1.0, 0.0]], np.float32)

    def configure(eng):
        eng.precise_vectors = True
        eng.eps = 1e-12
        eng.init_vector = None

    vals, vecs = solve_hermitian(
        DenseOperator(jnp.asarray(hr)), DenseOperator(jnp.asarray(hi)),
        num_eigs=1, find_maximum=False, configure=configure,
    )
    # H = [[0, i, 1], [-i, 0, i], [1, -i, 0]]: min eigenvalue -2.
    assert abs(float(vals[0]) - (-2.0)) < 1e-11
    h = hr.astype(np.complex128) + 1j * hi.astype(np.complex128)
    r = h @ vecs[0] - vals[0] * vecs[0]
    assert np.linalg.norm(r) < 1e-5  # f32 vector floor


def test_select_invariant_never_overruns_cap():
    """Ulp-spaced degenerate cluster straddling the selection boundary:
    _select_invariant_pv must never return more columns than requested in
    the non-overshoot (restart keep) path — the fixed-size keep buffers
    would be overrun (found by review; crashes as a numpy broadcast error)."""
    from lanczos_tpu.solvers.thick_restart import _select_invariant_pv

    rng = np.random.default_rng(5)
    m = 12
    base = -2.0
    # 8 eigenvalues within a few ulps of each other + 4 separated ones.
    evs = np.concatenate([
        base + np.arange(8) * np.spacing(abs(base)),
        np.array([-1.0, -0.5, 0.25, 1.0]),
    ])
    q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    m_host = (q * evs) @ q.T
    for n_sel in (2, 4, 6):
        qs, theta = _select_invariant_pv(m_host, n_sel, False)
        assert qs.shape[1] <= n_sel, (n_sel, qs.shape)
        assert theta.shape == (qs.shape[1], qs.shape[1])
        if qs.shape[1]:
            resid = np.linalg.norm(m_host @ qs - qs @ theta)
            assert resid < 1e-10 * np.linalg.norm(m_host), resid


def test_pv_exact_relation_property():
    """The pv engines' foundational invariant, pinned directly: after a
    fused pv stage, A V = V M + beta_last r e_last^T holds columnwise to
    ~1e-13 in f64, where M = T + C is rebuilt from the recorded
    alpha/beta/coupling buffers.  Every pv bug found in round 3 (hi-only
    arrowhead subtraction, f32-rounded pass sums, non-invariant restart
    subspaces) broke exactly this identity — it is the one property the
    accuracy claims rest on."""
    import jax

    from lanczos_tpu.solvers.lanczos_fused import _fused_stage, _init_state

    n, cap = 96, 24
    rng = np.random.default_rng(2)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    from lanczos_tpu import DenseOperator

    op = DenseOperator(jnp.asarray(a))
    v0 = rng.standard_normal(n).astype(np.float32)
    v0 /= np.linalg.norm(v0)
    defl = jnp.zeros((1, n), np.float32)
    mask = jnp.zeros((1,), np.float32)

    state = _init_state(jnp.asarray(v0), cap, 1, precise_vectors=True, nd=1)
    state = _fused_stage(
        op, state, defl, mask, 0.0, 0.0, 1, False, 1 << 30, 2, "full",
        False, True, k_limit=jnp.asarray(cap, jnp.int32),
    )
    m_done = int(np.asarray(state.k)) - 1
    assert m_done == cap

    u64 = np.asarray(state.u_buf, np.float64) + np.asarray(state.u_lo, np.float64)
    alphas = np.asarray(state.alpha, np.float64) + np.asarray(state.alpha_lo, np.float64)
    bsq = np.asarray(state.bsq_hi, np.float64) + np.asarray(state.bsq_lo, np.float64)
    betas = np.sqrt(np.maximum(bsq, 0.0))
    coup = np.asarray(state.coup, np.float64)

    m = np.diag(alphas[:m_done])
    m += np.diag(betas[: m_done - 1], 1) + np.diag(betas[: m_done - 1], -1)
    m += coup[:m_done, :m_done]

    v = u64[:m_done]
    r = u64[m_done]
    e = a.astype(np.float64) @ v.T - v.T @ m
    e[:, -1] -= betas[m_done - 1] * r
    col = np.linalg.norm(e, axis=0)
    assert col.max() < 1e-12, col


def test_pv_dense_df_operator_f64_entries():
    """Matrices with non-f32-representable entries: DenseDFOperator carries
    the f64 entries as df64 word pairs, so pv reaches ~1e-12 where an
    f32-entry DenseOperator floors at the ~1e-8 entry-rounding error."""
    from lanczos_tpu import DenseDFOperator, DenseOperator

    rng = np.random.default_rng(7)
    a = rng.standard_normal((48, 48))
    a = (a + a.T) / 2  # generic f64 entries
    ref = np.linalg.eigvalsh(a)

    def solve(op):
        eng = LambdaLanczos(op, find_maximum=True, dtype=np.float32, mode="fused")
        eng.precise_vectors = True
        eng.eps = 1e-13
        val, _ = eng.run_one()
        return abs(val - ref[-1])

    err_df = solve(DenseDFOperator.from_f64(a))
    err_f32 = solve(DenseOperator(jnp.asarray(a, jnp.float32)))
    assert err_df < 1e-11, err_df
    # the f32-entry operator is limited by entry rounding, orders above
    assert err_f32 > 10 * err_df
