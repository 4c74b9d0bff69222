"""Phase breakdown of the flagship n=4.19M thick-restart solve.

Wraps the fused-stage / coupling / rotation boundaries with wall-clock
accumulators (host-side: the engine's cycle loop is Python, so the wrapper
sees every device call) and prints per-deflation-round and per-phase
totals.  Run on the real chip with a warm compile cache:

    LANCZOS_TPU_CACHE_DIR=~/.cache/lanczos_tpu/jax \
        python experiments/flagship_profile.py [n_log2=22]
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

phase_s: dict[str, float] = defaultdict(float)
phase_calls: dict[str, int] = defaultdict(int)


def _timed(name, fn, sync=None):
    """Wrap fn; sync(result) must force device completion for honest walls."""

    def wrapper(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        if sync is not None:
            sync(out)
        phase_s[name] += time.perf_counter() - t0
        phase_calls[name] += 1
        return out

    return wrapper


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << n_log2

    from lanczos_tpu import DIAOperator, LambdaLanczos
    from lanczos_tpu.solvers import lanczos_fused as lf
    from lanczos_tpu.solvers import thick_restart as tr

    # The fused stage returns a state pytree; sync on the scalar iterate
    # counter (host transfer — block_until_ready lies through the tunnel).
    # thick_restart imports _fused_stage from lanczos_fused at call time,
    # so patching the lanczos_fused module attribute covers both engines.
    lf._fused_stage = _timed(
        "fused_stage", lf._fused_stage, sync=lambda s: np.asarray(jax.device_get(s.k))
    )
    tr._coupling_row = _timed(
        "coupling_row", tr._coupling_row, sync=lambda s: np.asarray(jax.device_get(s[0]))
    )
    real_eigh = np.linalg.eigh
    np.linalg.eigh = _timed("host_eigh", real_eigh)
    real_eigvalsh = np.linalg.eigvalsh
    np.linalg.eigvalsh = _timed("host_eigvalsh", real_eigvalsh)

    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3)
    eng.eigenvalue_offset = -4.0
    eng.eps = 1e-6
    eng.max_iteration = 256
    eng.max_restarts = 8
    eng.restart_policy = "thick"
    eng.reorth_policy = "selective"
    eng.convergence_check_interval = 8

    for which in ("cold", "warm"):
        phase_s.clear()
        phase_calls.clear()
        t0 = time.perf_counter()
        vals, vecs = eng.run()
        wall = time.perf_counter() - t0
        exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
        errs = [abs(vals[i] - exact[i]) for i in range(3)]
        accounted = sum(phase_s.values())
        print(
            json.dumps(
                {
                    "which": which,
                    "n": n,
                    "wall_s": round(wall, 2),
                    "accounted_s": round(accounted, 2),
                    "unaccounted_s": round(wall - accounted, 2),
                    "iters": list(eng.iteration_counts),
                    "errs": [f"{e:.2e}" for e in errs],
                    "phases": {
                        k: {"s": round(v, 2), "calls": phase_calls[k]}
                        for k, v in sorted(phase_s.items(), key=lambda kv: -kv[1])
                    },
                }
            ),
            flush=True,
        )

    np.linalg.eigh = real_eigh
    np.linalg.eigvalsh = real_eigvalsh


if __name__ == "__main__":
    main()
