"""Flagship production-scale solve: n=4,194,304 chain, 3 lowest eigenpairs.

Runs the SAME engine twice in one process: the first wall includes every
jit compile through the axon tunnel (30-120 s per distinct program shape —
the staged/segmented fused thick-restart engine compiles several), the
second wall is the steady-state solve time a production deployment sees
(compiles cached).  Report both; README quotes the steady state.

Run on the real chip: python experiments/tpu_flagship.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def one_solve(n):
    from lanczos_tpu import DIAOperator, LambdaLanczos

    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3)
    # Fresh-entropy init (reference default) on purpose: the 3 lowest chain
    # eigenvalues are ~1e-12 apart, and each deflation round's NEW random
    # direction is what refines the degenerate copies to ~1e-6 (a fixed
    # seed replays the same v0 every round and plateaus at ~1e-5).  The
    # deflation driver's noise-robust fixed point stops the rounds once
    # insertions stop improving the kept set beyond eps.
    eng.eigenvalue_offset = -4.0
    eng.eps = 1e-6
    eng.max_iteration = 256
    eng.max_restarts = 8
    eng.restart_policy = "thick"
    eng.reorth_policy = "selective"
    eng.convergence_check_interval = 8
    t0 = time.perf_counter()
    vals, vecs = eng.run()
    dt = time.perf_counter() - t0
    exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
    errs = [abs(vals[i] - exact[i]) for i in range(3)]
    reorth = (eng.stats.reorth_count, eng.stats.total_iterations)
    return dt, errs, list(eng.iteration_counts), eng.residuals(vals, vecs), reorth


def main():
    # Wall clock through the tunnel has ±3-4 s run-to-run spread (measured:
    # 60.7 / 62.1 / 65.0 s for semantically identical programs), so the
    # steady state is the MEDIAN of three warm passes, not a single sample.
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = 1 << 22
    out = {"backend": jax.default_backend(), "n": n}
    dt, errs, iters, res, reorth = one_solve(n)
    out["cold"] = {
        "wall_s": round(dt, 1),
        "errs": [f"{e:.2e}" for e in errs],
        "iters": iters,
        "residuals": [f"{float(r):.2e}" for r in res],
        "reorth": reorth,
    }
    print("cold", out["cold"], flush=True)
    warms = []
    for i in range(n_warm):
        dt, errs, iters, res, reorth = one_solve(n)
        warms.append(dt)
        out[f"warm{i}"] = {
            "wall_s": round(dt, 1),
            "errs": [f"{e:.2e}" for e in errs],
            "iters": iters,
            "residuals": [f"{float(r):.2e}" for r in res],
            "reorth": reorth,
        }
        print(f"warm{i}", out[f"warm{i}"], flush=True)
    out["warm_median_s"] = round(float(np.median(warms)), 1)
    print("warm median:", out["warm_median_s"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
