"""Brief degree/mu/block sweep around the winning Chebyshev flagship config.

Round-4 follow-up to experiments/tpu_flagship_cheby.py (degree=400, mu=1e-5,
block=1: 16.9 s warm median vs the 55.7 s scalar flagship).  One process,
many variants (cold compiles through the tunnel are the expensive part —
CLAUDE.md), one warm repeat per variant; the winner gets a 3-pass median in
the main experiment script.

Run: python experiments/tpu_cheby_sweep.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from lanczos_tpu.utils.compile_cache import enable_compilation_cache
from tpu_flagship_cheby import one_solve

enable_compilation_cache()


def main():
    n = 1 << 22
    import ast
    variants = [
        (200, 1e-5, 1),
        (800, 1e-5, 1),
        (400, 1e-4, 1),
        (400, 1e-6, 1),
        (400, 1e-5, 3),
    ]
    if len(sys.argv) > 1:  # e.g. "[(250,1e-5,1),(300,1e-5,1)]"
        variants = ast.literal_eval(sys.argv[1])
    out = {}
    for degree, mu, block in variants:
        key = f"d{degree}_mu{mu:g}_b{block}"
        try:
            dt_cold, errs, info = one_solve(n, degree, mu, block)
            dt_warm, errs_w, info_w = one_solve(n, degree, mu, block)
            out[key] = {
                "cold_s": round(dt_cold, 1),
                "warm_s": round(dt_warm, 1),
                "max_err": f"{max(errs_w):.2e}",
                "iters": info_w["iteration_counts"],
                "matvecs": info_w["matvecs"],
            }
        except Exception as e:  # noqa: BLE001 — keep sweeping
            out[key] = {"error": repr(e)[:200]}
        print(key, out[key], flush=True)
        time.sleep(2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
