"""Flagship A/B: block thick restart (b=3) vs the scalar thick flagship.

Same problem as tpu_flagship.py — n=4,194,304 chain, 3 lowest eigenpairs
(1e-12-degenerate triple).  The scalar engine burns 4 deflation rounds of
~1444 iterations each (~61 s steady); the width-3 block engine should
capture the triple in ONE round (+1 confirmation) and amortize every
reorthogonalization pass over 3 vectors.

Run on the real chip: python experiments/tpu_flagship_block.py [n_warm]
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


def one_solve(n, block, passes=None):
    from lanczos_tpu import DIAOperator, LambdaLanczos

    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3)
    eng.eigenvalue_offset = -4.0
    eng.max_iteration = 256  # basis ROWS (same memory budget as scalar)
    eng.restart_policy = "thick"
    eng.block_size = block
    if passes is not None:
        eng.reorth_passes = passes
    if block == 1:
        eng.eps = 1e-6
        eng.max_restarts = 8
        eng.reorth_policy = "selective"
        eng.convergence_check_interval = 8
    else:
        # Accuracy-MATCHED block config (CPU proxy at n=262144: maxerr
        # 1.1e-6 in 3 rounds x 1511 steps vs scalar's 1.2-1.6e-6 in 4 x
        # 1444): a degenerate cluster converges COLLECTIVELY in a block
        # build, so it needs a deeper drift target and a wider kept
        # subspace than the scalar's per-member rounds.
        eng.eps = 5e-8
        eng.max_restarts = 24
        eng.thick_keep = 24
    t0 = time.perf_counter()
    vals, vecs = eng.run()
    dt = time.perf_counter() - t0
    exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
    errs = [abs(vals[i] - exact[i]) for i in range(3)]
    return dt, errs, list(eng.iteration_counts), eng.residuals(vals, vecs)


def main():
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = 1 << 22
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else None
    out = {"backend": jax.default_backend(), "n": n, "block": b, "passes": passes}
    dt, errs, iters, res = one_solve(n, b, passes)
    out["cold"] = {
        "wall_s": round(dt, 1),
        "errs": [f"{e:.2e}" for e in errs],
        "iters": iters,
        "residuals": [f"{float(r):.2e}" for r in res],
    }
    print("cold", out["cold"], flush=True)
    warms = []
    for i in range(n_warm):
        dt, errs, iters, res = one_solve(n, b, passes)
        warms.append(dt)
        out[f"warm{i}"] = {
            "wall_s": round(dt, 1),
            "errs": [f"{e:.2e}" for e in errs],
            "iters": iters,
            "residuals": [f"{float(r):.2e}" for r in res],
        }
        print(f"warm{i}", out[f"warm{i}"], flush=True)
    out["warm_median_s"] = round(float(np.median(warms)), 1)
    print("warm median:", out["warm_median_s"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
