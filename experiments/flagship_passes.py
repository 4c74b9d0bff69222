"""Does the flagship need CGS2 on the selective-trigger path, or is the
classical single-pass selective scheme (Parlett/Simon) enough at f32/1e-6?
Runs the flagship config with reorth_passes in {2, 1} and compares."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from lanczos_tpu import DIAOperator, LambdaLanczos

n = 1 << 22
op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
for passes in (2, 1):
    eng = LambdaLanczos(op, find_maximum=False, num_eigs=3)
    eng.eigenvalue_offset = -4.0; eng.eps = 1e-6
    eng.max_iteration = 256; eng.max_restarts = 8
    eng.restart_policy = "thick"; eng.reorth_policy = "selective"
    eng.convergence_check_interval = 8; eng.reorth_passes = passes
    for which in ("cold", "warm"):
        t0 = time.perf_counter(); vals, vecs = eng.run(); dt = time.perf_counter() - t0
        errs = [abs(vals[i] - exact[i]) for i in range(3)]
        res = [float(r) for r in eng.residuals(vals, vecs)]
        print(f"passes={passes} {which}: {dt:7.1f} s  errs={[f'{e:.2e}' for e in errs]} "
              f"res={[f'{r:.2e}' for r in res]} iters={list(eng.iteration_counts)}", flush=True)
