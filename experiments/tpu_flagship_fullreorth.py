"""Flagship variant: reorth_policy='full' with passes=1 — i.e. the same
single reorthogonalization pass as the auto-resolved selective policy but
UNCONDITIONAL (no lax.cond gate, so the ungated Pallas path applies).

Comparing its warm wall against the selective flagship separates the
selective trigger rate from the formulation cost:
  wall(full) ~ wall(selective)  =>  trigger fires ~every iteration and the
  cond gate is pure overhead at this operating point.

Run: python experiments/tpu_flagship_fullreorth.py
(LANCZOS_TPU_NO_PALLAS_CGS=1 for the fori-loop A/B.)
"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

def one_solve(n):
    from lanczos_tpu import DIAOperator, LambdaLanczos
    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3)
    eng.eigenvalue_offset = -4.0
    eng.eps = 1e-6
    eng.max_iteration = 256
    eng.max_restarts = 8
    eng.restart_policy = "thick"
    eng.reorth_policy = "full"
    eng.reorth_passes = 1
    eng.convergence_check_interval = 8
    t0 = time.perf_counter()
    vals, vecs = eng.run()
    dt = time.perf_counter() - t0
    exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
    errs = [abs(float(v) - e) for v, e in zip(sorted(np.asarray(vals)), exact)]
    return {"wall_s": round(dt, 1), "errs": [f"{e:.2e}" for e in errs],
            "iters": list(map(int, eng.iteration_counts))}

def main():
    n = 1 << 22
    cold = one_solve(n)
    print("cold", cold, flush=True)
    warm = one_solve(n)
    print("warm", warm, flush=True)
    print(json.dumps({"backend": jax.default_backend(), "n": n, "cold": cold, "warm": warm}), flush=True)

if __name__ == "__main__":
    main()
