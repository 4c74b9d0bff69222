"""The reference's own test zoo ON THE TPU CHIP at reference tolerances.

BASELINE.md target 1 is "match every reference test tolerance on the same
matrix zoo".  The CPU f64 path does that in tests/; this script runs the
hardest zoo entries on the real chip through the f32 `precise_vectors`
engine (double-float Krylov vectors + df Sturm convergence) and prints the
achieved eigenvalue errors next to each reference tolerance.

Zoo entries (reference test/lambda_lanczos_test.cpp):
  3x3 dense, eigvals {4,1,1}, offset 6             (:128-161, default eps)
  stencil n=10, min eig -2cos(pi/11), eps=1e-14    (:262-308)
  multiroot 8x8, 3 lowest, 8-digit truth, eps=1e-7 (:442-488)
  degenerate ring n=50, 26 lowest, eps=1e-14       (:490-536)
  random Hermitian n=10, max pair, eps=1e-14       (:715-755; complex via
                                                    the split embedding + pv)
  n=1 edge case                                    (:411-440)

Run: python experiments/tpu_reference_zoo.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp


def solve(matrix_or_op, n, *, find_maximum, num_eigs=1, eps=None, offset=0.0, cap=None):
    from lanczos_tpu import LambdaLanczos
    from lanczos_tpu.utils.random import fixed_seed_initializer

    eng = LambdaLanczos(matrix_or_op, find_maximum=find_maximum, num_eigs=num_eigs, dtype=np.float32)
    eng.precise_vectors = True
    eng.mode = "fused"
    if eps is not None:
        eng.eps = eps
    eng.eigenvalue_offset = offset
    eng.initial_buffer_size = cap or min(max(2 * n, 8), 256)
    eng.init_vector = fixed_seed_initializer(np.float32, seed=42)
    if num_eigs == 1:
        val, vec = eng.run_one()
        return [float(val)], [np.asarray(vec)]
    vals, vecs = eng.run()
    return [float(v) for v in vals], [np.asarray(v) for v in vecs]


def main():
    import jax

    out = {"backend": jax.default_backend()}

    # 3x3 dense {4,1,1} (reference :128-161; tol = |4| * machine_eps*1e3)
    m3 = jnp.asarray([[2.0, 1.0, 1.0], [1.0, 2.0, 1.0], [1.0, 1.0, 2.0]], jnp.float32)
    vals, _ = solve(m3, 3, find_maximum=True, eps=1e-12, offset=6.0)
    out["dense3x3"] = {"err": abs(vals[0] - 4.0), "ref_tol": 4.0 * 2.2e-13}
    print("dense3x3", out["dense3x3"], flush=True)

    # stencil n=10 (reference :262-308, eps=1e-14 relative)
    n = 10
    a = np.zeros((n, n), np.float32)
    i = np.arange(n - 1)
    a[i, i + 1] = a[i + 1, i] = -1.0
    truth = -2.0 * np.cos(np.pi / (n + 1))
    vals, _ = solve(jnp.asarray(a), n, find_maximum=False, eps=1e-13, offset=-4.0)
    out["stencil10"] = {"rel_err": abs((vals[0] - truth) / truth), "ref_tol": 1e-14}
    print("stencil10", out["stencil10"], flush=True)

    # multiroot 8x8 (reference :442-488, eps=1e-7, 8-digit ground truths)
    m8 = np.array(
        [
            [6, -3, -3, 0, -1, 1, -1, 1],
            [-3, -4, 2, 2, -1, -5, 0, -4],
            [-3, 2, 2, -3, 0, 0, -1, -1],
            [0, 2, -3, 0, -3, 3, 2, 2],
            [-1, -1, 0, -3, -2, 0, -5, -4],
            [1, -5, 0, 3, 0, -4, 5, 0],
            [-1, 0, -1, 2, -5, 5, -4, 4],
            [1, -4, -1, 2, -4, 0, 4, 2],
        ],
        np.float32,
    )  # reference :446-453
    truths = [-13.21508597, -8.50033154, -4.26674892]  # reference :473
    vals, _ = solve(jnp.asarray(m8), 8, find_maximum=False, num_eigs=3, eps=1e-9)
    out["multiroot8"] = {
        "errs": [abs(vals[k] - truths[k]) for k in range(3)],
        "ref_tol": 1e-7,
    }
    print("multiroot8", out["multiroot8"], flush=True)

    # degenerate ring n=50, 26 lowest (reference :490-536, eps=1e-14 abs).
    # Eigenvalues -2cos(2 pi i / n), doubly degenerate except the extremes.
    n = 50
    ring = np.zeros((n, n), np.float32)
    i = np.arange(n)
    ring[i, (i + 1) % n] = ring[(i + 1) % n, i] = 1.0
    exact = sorted(-2.0 * np.cos(2.0 * np.pi * k / n) for k in range(n))
    vals, _ = solve(jnp.asarray(ring), n, find_maximum=False, num_eigs=26, eps=1e-12)
    errs = [abs(vals[k] - exact[k]) for k in range(len(vals))]
    out["ring50"] = {"found": len(vals), "max_err": max(errs), "ref_tol": 1e-14}
    print("ring50", out["ring50"], flush=True)

    # n=1 edge case (reference :411-440)
    vals, vecs = solve(jnp.asarray([[7.0]], jnp.float32), 1, find_maximum=True, eps=1e-12, cap=2)
    out["n1"] = {"err": abs(vals[0] - 7.0), "vec": float(abs(vecs[0][0]))}
    print("n1", out["n1"], flush=True)

    # random Hermitian n=10 at eps=1e-14 (reference :715-755): complex
    # Hermitian through the real split embedding + precise_vectors (the
    # documented pv complex route) — the last 1e-14 zoo entry on chip.
    rng = np.random.default_rng(1)
    nh = 10
    d = rng.uniform(1.0, nh * 10, nh)
    ah = np.diag(d).astype(np.complex128)
    for _ in range(nh * 10):
        k2, l2 = rng.choice(nh, size=2, replace=False)
        th, p1, p2 = rng.uniform(0, 2 * np.pi, 3)
        u = np.eye(nh, dtype=np.complex128)
        u[k2, k2] = np.exp(1j * p1) * np.cos(th)
        u[k2, l2] = -np.exp(1j * p2) * np.sin(th)
        u[l2, k2] = np.exp(-1j * p2) * np.sin(th)
        u[l2, l2] = np.exp(-1j * p1) * np.cos(th)
        ah = u @ ah @ u.conj().T
    ah = (ah + ah.conj().T) / 2
    truth_h = float(np.max(d))

    from lanczos_tpu import DenseDFOperator
    from lanczos_tpu.ops.hermitian_split import solve_hermitian

    def configure(eng):
        eng.precise_vectors = True
        eng.mode = "fused"
        eng.eps = 1e-14

    # DenseDF: the rotated matrix's entries are NOT f32-representable, so an
    # f32-entry operator floors at the entry-rounding error (~8e-9 measured);
    # df64 entries restore the engines' 1e-14 regime.
    vals_h, _vecs_h = solve_hermitian(
        DenseDFOperator.from_f64(ah.real),
        DenseDFOperator.from_f64(ah.imag),
        num_eigs=1, find_maximum=True, configure=configure,
    )
    out["hermitian10"] = {
        "rel_err": abs(float(vals_h[0]) - truth_h) / truth_h, "ref_tol": 1e-14,
    }
    print("hermitian10", out["hermitian10"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
