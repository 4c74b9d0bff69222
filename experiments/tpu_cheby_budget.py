"""B-space budget sweep for the filtered flagship.

Round-4 observation: every deflation round runs EXACTLY 171 B-space rows
(max_restarts=4 x max_iteration=48, thick) because the amplified degenerate
band never eps-converges at f32 drift noise — the rounds are budget-capped,
so flagship wall is proportional to the B-space budget.  The A-space answer
comes from the final Rayleigh-Ritz over the subspace, so the question is
purely: how small can the budget get before the subspace quality (residual
~2.3e-3, error ~ res^2/gap ~ 2.5e-7) degrades past the 2e-6 bar?

Run: python experiments/tpu_cheby_budget.py
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


def one(n, degree, mu, max_restarts, max_iteration):
    from lanczos_tpu import DIAOperator, filtered_lanczos

    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)

    def cfg(eng):
        eng.max_restarts = max_restarts
        eng.max_iteration = max_iteration

    t0 = time.perf_counter()
    vals, vecs, info = filtered_lanczos(
        op, num_eigs=3, degree=degree, mu=mu, lo=-2.0, hi=2.0, configure=cfg)
    dt = time.perf_counter() - t0
    exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
    errs = [abs(float(vals[i]) - exact[i]) for i in range(3)]
    return dt, max(errs), info


def main():
    n = 1 << 22
    out = {}
    for mr, mi in ((2, 48), (3, 48), (4, 32), (2, 64), (1, 48)):
        key = f"r{mr}_m{mi}"
        try:
            dt_c, err_c, _ = one(n, 400, 1e-5, mr, mi)
            dt_w, err_w, info = one(n, 400, 1e-5, mr, mi)
            out[key] = {
                "cold_s": round(dt_c, 1), "warm_s": round(dt_w, 1),
                "max_err": f"{err_w:.2e}", "iters": info["iteration_counts"],
                "matvecs": info["matvecs"],
                "residuals": [f"{float(r):.1e}" for r in info["residuals"]],
            }
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": repr(e)[:200]}
        print(key, out[key], flush=True)
        time.sleep(2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
