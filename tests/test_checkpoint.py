"""Checkpoint/resume tests (TPU-native addition; reference has none,
SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp

from lanczos_tpu import LambdaLanczos
from lanczos_tpu.solvers.lanczos import EigenPairManager
from lanczos_tpu.utils.checkpoint import CheckpointedRun, load_state, save_state
from lanczos_tpu.utils.random import fixed_seed_initializer


def _matrix(n=16, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return (a + a.T) / 2


def test_save_load_roundtrip(tmp_path):
    m = EigenPairManager(True, 3)
    m.insert([2.0, 1.0], [jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])])
    p = tmp_path / "ck.npz"
    save_state(p, m, [5, 7])
    m2, counts = load_state(p, np.float64)
    assert counts == [5, 7]
    assert m2.eigenvalues() == m.eigenvalues()
    np.testing.assert_array_equal(np.asarray(m2.eigenvectors()[0]), np.asarray(m.eigenvectors()[0]))


def test_checkpointed_run_matches_plain(tmp_path):
    a = _matrix()
    eng = LambdaLanczos(jnp.asarray(a), find_maximum=True, num_eigs=3)
    eng.init_vector = fixed_seed_initializer(np.float64, seed=11)
    vals_plain, _ = eng.run()

    eng2 = LambdaLanczos(jnp.asarray(a), find_maximum=True, num_eigs=3)
    eng2.init_vector = fixed_seed_initializer(np.float64, seed=11)
    vals_ck, vecs_ck = CheckpointedRun(eng2, tmp_path / "run.npz").run()
    np.testing.assert_allclose(vals_ck, vals_plain, atol=1e-10)


def test_resume_from_partial_state(tmp_path):
    a = _matrix()
    w = np.linalg.eigvalsh(a)[::-1]

    # Simulate a crash after the first restart: run once with num_eigs=3,
    # keep the checkpoint, then resume a fresh engine from it.
    eng = LambdaLanczos(jnp.asarray(a), find_maximum=True, num_eigs=3)
    eng.init_vector = fixed_seed_initializer(np.float64, seed=1)
    path = tmp_path / "partial.npz"
    run = CheckpointedRun(eng, path)
    vals1, _ = run.run()
    assert path.exists()

    eng2 = LambdaLanczos(jnp.asarray(a), find_maximum=True, num_eigs=3)
    eng2.init_vector = fixed_seed_initializer(np.float64, seed=2)
    vals2, _ = CheckpointedRun(eng2, path).run()
    np.testing.assert_allclose(vals2, w[:3], atol=1e-9)


def test_resume_after_finished_skips_rerun(tmp_path):
    """A checkpoint written at the deflation fixed point (the crash window
    between the final save and run() returning) must resume by returning the
    stored result — not burn a whole extra deflated restart."""
    a = _matrix()
    eng = LambdaLanczos(jnp.asarray(a), find_maximum=True, num_eigs=3)
    eng.init_vector = fixed_seed_initializer(np.float64, seed=3)
    path = tmp_path / "done.npz"
    vals1, _ = CheckpointedRun(eng, path).run()

    calls = {"n": 0}
    real_init = fixed_seed_initializer(np.float64, seed=3)

    def counting_init(n):
        calls["n"] += 1
        return real_init(n)

    eng2 = LambdaLanczos(jnp.asarray(a), find_maximum=True, num_eigs=3)
    eng2.init_vector = counting_init
    vals2, vecs2 = CheckpointedRun(eng2, path).run()
    assert calls["n"] == 0, "finished checkpoint should not launch any restart"
    np.testing.assert_allclose(np.sort(vals2), np.sort(vals1), atol=1e-12)
    assert eng2.iteration_counts == eng.iteration_counts


def test_checkpointed_run_precise_vectors_thick(tmp_path):
    """Checkpoint/resume over the pv thick engine (the round-3 production
    accuracy path): the shared deflation driver makes resume engine-agnostic,
    but pin it — a pv-specific state leak would corrupt resumed rounds."""
    from lanczos_tpu import DIAOperator

    n = 256
    op = DIAOperator.from_diagonals(
        [-1, 1], [np.full(n, -1.0, np.float32), np.full(n, -1.0, np.float32)], n
    )

    def make_engine():
        eng = LambdaLanczos(op, find_maximum=False, num_eigs=2, dtype=np.float32, mode="fused")
        eng.precise_vectors = True
        eng.restart_policy = "thick"
        eng.max_iteration = 40
        eng.max_restarts = 64
        eng.eps = 1e-12
        eng.eigenvalue_offset = -4.0
        return eng

    path = tmp_path / "pv.npz"
    vals1, _ = CheckpointedRun(make_engine(), path).run()
    assert path.exists()
    # Resume (finished state: must skip the re-run and return saved pairs).
    vals2, _ = CheckpointedRun(make_engine(), path).run()
    exact = np.sort(-2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1)))[:2]
    np.testing.assert_allclose(np.sort(np.asarray(vals1)), exact, atol=1e-10)
    np.testing.assert_allclose(np.sort(np.asarray(vals2)), np.sort(np.asarray(vals1)), atol=1e-12)
