"""Interleaved A/B: flagship B-space budget r4_m48 vs r2_m48.

Chip-session drift (±15-40% between sessions through the tunnel) swamps
sequential cross-process comparisons at this scale, so — like the
SpMV/stream pairing in bench.py — run the two configs ALTERNATELY in one
process and compare medians.  Rounds are budget-capped (iters deterministic:
171 vs 89 per deflation round), so the wall ratio is structural.

Run: python experiments/tpu_cheby_budget_interleaved.py [n_pairs]
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


def one(n, mr, mi):
    from lanczos_tpu import DIAOperator, filtered_lanczos

    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)

    def cfg(eng):
        eng.max_restarts = mr
        eng.max_iteration = mi

    t0 = time.perf_counter()
    vals, _vecs, _info = filtered_lanczos(
        op, num_eigs=3, degree=400, mu=1e-5, lo=-2.0, hi=2.0, configure=cfg)
    dt = time.perf_counter() - t0
    exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
    err = max(abs(float(vals[i]) - exact[i]) for i in range(3))
    return dt, err


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = 1 << 22
    # warm-up both compiled paths (budgets are dynamic operands, but warm
    # each once so neither side pays residual compile/teardown in the pairs)
    one(n, 4, 48)
    one(n, 2, 48)
    w4, w2, e4, e2 = [], [], [], []
    for i in range(n_pairs):
        dt, err = one(n, 4, 48)
        w4.append(dt); e4.append(err)
        dt, err = one(n, 2, 48)
        w2.append(dt); e2.append(err)
        print(f"pair{i}: r4 {w4[-1]:.1f}s {e4[-1]:.2e}  r2 {w2[-1]:.1f}s {e2[-1]:.2e}",
              flush=True)
    out = {
        "backend": jax.default_backend(), "n": n, "pairs": n_pairs,
        "r4_median_s": round(float(np.median(w4)), 1),
        "r2_median_s": round(float(np.median(w2)), 1),
        "speedup": round(float(np.median(w4)) / float(np.median(w2)), 2),
        "r4_max_err": f"{max(e4):.2e}", "r2_max_err": f"{max(e2):.2e}",
        "r4_walls": [round(w, 1) for w in w4], "r2_walls": [round(w, 1) for w in w2],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
