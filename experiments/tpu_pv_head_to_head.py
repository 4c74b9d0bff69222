"""Head-to-head vs the reference C++ at ITS OWN accuracy, on the TPU.

BASELINE.md's round-2 head-to-head ran our CPU f64 path against the
reference compiled -O3 (3 lowest eigenpairs of the clustered chain bottom,
eps=1e-12, offset -4): reference 15.7 / 126.6 / 905.5 s at n=1000/2000/4000.
Round 3's precise_vectors + thick restart makes the same eps=1e-12 problem
solvable ON THE f32 CHIP in bounded memory — this measures it.

Matching conditions: same matrix (hopping chain), same 3 lowest targets,
same eps=1e-12 drift + the pv engine's res^2/gap error gate (strictly
harder), offset -4, basis capped at 96 rows (the reference's basis grows
unboundedly: ~n rows).

Run: python experiments/tpu_pv_head_to_head.py
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
    import jax.numpy as jnp

    from lanczos_tpu import LambdaLanczos
    from lanczos_tpu.ops.operators import DIAOperator
    from lanczos_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    for n in (1000, 2000, 4000):
        op = DIAOperator.from_diagonals(
            [-1, 1], [jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32)], n
        )
        eng = LambdaLanczos(op, find_maximum=False, num_eigs=3, dtype=np.float32, mode="fused")
        eng.precise_vectors = True
        eng.restart_policy = "thick"
        eng.max_iteration = 96
        eng.max_restarts = 256
        eng.eps = 1e-12
        eng.eigenvalue_offset = -4.0
        t0 = time.perf_counter()
        vals, vecs = eng.run()
        wall = time.perf_counter() - t0
        exact = np.sort(-2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1)))[:3]
        err = float(np.max(np.abs(np.sort(np.asarray(vals)) - exact)))
        out[n] = {
            "wall_s": round(wall, 1),
            "ref_s": REF_SECONDS[n],
            "speedup": round(REF_SECONDS[n] / wall, 1),
            "max_eig_err": err,
            "iters": list(eng.iteration_counts),
        }
        print(f"n={n}: {wall:.1f}s vs reference {REF_SECONDS[n]}s "
              f"({out[n]['speedup']}x), max err {err:.2e}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
