"""Precise-filtered head-to-head vs the reference C++ at ITS OWN accuracy.

Round-4 final: `filtered_lanczos(..., precise=True)` — the SPECTRAL
INVERSE-MAP REFINEMENT.  A coarse scout pass locates the targets, a df64
B-space solve (the filter operator has matvec_df) converges their filtered
Ritz values to drift eps_b, and the ANALYTIC inverse of the filter map
returns A-eigenvalues with error b_err / T_p'(lambda) — the filter's
steepness (T_p' ~ 1e5..1e6 at the band) turns f32-hardware B values into
f64-exact A values.

Same problems as experiments/tpu_pv_head_to_head.py (3 lowest of the
hopping chain, reference -O3 C++ at eps=1e-12: 15.7 / 126.6 / 905.5 s at
n=1000/2000/4000; our pv+thick engine: 13.3 / 22.1 / 56.5 s at
1.0e-13..1.3e-12).  Measured round 4 on the real v5e (3 reps, warm median,
fully automatic mu/degree):

    n=1000: 1.0 s  err 0.0e+00   16x over reference
    n=2000: 1.1 s  err 4.4e-16  117x
    n=4000: 1.2 s  err 0.0e+00  763x

Run: python experiments/tpu_precise_filter_h2h.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REF_SECONDS = {1000: 15.7, 2000: 126.6, 4000: 905.5}  # BASELINE.md round 2


def main():
    from lanczos_tpu import DIAOperator, filtered_lanczos
    from lanczos_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    for n in (1000, 2000, 4000):
        op = DIAOperator.from_diagonals(
            [-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
        exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
        walls, errs_all = [], []
        for rep in range(3):
            t0 = time.perf_counter()
            vals, _vecs, info = filtered_lanczos(
                op, num_eigs=3, lo=-2.0, hi=2.0, precise=True)
            dt = time.perf_counter() - t0
            walls.append(dt)
            errs = [abs(float(vals[i]) - exact[i]) for i in range(3)]
            errs_all.append(max(errs))
            print(f"n={n} rep{rep} wall {dt:.1f}s max_err {max(errs):.1e} "
                  f"iters {info['iteration_counts']} mu {info['mu']:.1e} "
                  f"d {info['filter_degree']}", flush=True)
        w = float(np.median(walls[1:]))
        out[n] = {
            "warm_median_s": round(w, 1),
            "max_err": f"{max(errs_all):.1e}",
            "speedup_vs_ref": round(REF_SECONDS[n] / w, 1),
        }
        print(f"n={n} -> {out[n]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
