"""Accuracy A/B for the full-reorth pass-count default (round 3).

experiments/fused_iter_breakdown.py showed each CGS pass costs two
stream-rate basis sweeps (project + update), so CGS2 doubles the dominant
iteration cost.  The reference performs ONE Gram-Schmidt sweep per
iteration (schmidt_orth, linear_algebra.hpp:132-144, called once against
the basis at lambda_lanczos.hpp:260); this run checks that one classical
pass reaches the same eigenvalue accuracy as CGS2 on the chip before the
auto default flips to 1.

Problem: n=2^20 chain, lowest eigenvalue, fused full-reorth engine with
df64 scalar reductions (production f32 accuracy path), eps=1e-9.

Run: python experiments/full_passes_accuracy.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax.numpy as jnp

    from lanczos_tpu import LambdaLanczos
    from lanczos_tpu.ops.operators import DIAOperator
    from lanczos_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << 20
    op = DIAOperator.from_diagonals(
        [-1, 1], [jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32)], n
    )
    exact = -2.0 * np.cos(np.pi / (n + 1))
    out = {}
    for passes in (2, 1):
        eng = LambdaLanczos(op, find_maximum=False, dtype=np.float32, mode="fused")
        eng.eigenvalue_offset = -4.0
        eng.eps = 1e-9
        eng.max_iteration = 96
        eng.max_restarts = 64
        eng.restart_policy = "thick"
        eng.reorth_passes = passes
        t0 = time.perf_counter()
        val, _ = eng.run_one()
        out[f"p{passes}"] = {
            "err": float(abs(val - exact)),
            "wall_s": round(time.perf_counter() - t0, 1),
            "iters": list(eng.iteration_counts),
        }
        print(f"passes={passes}: err={out[f'p{passes}']['err']:.3e} "
              f"wall={out[f'p{passes}']['wall_s']}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
