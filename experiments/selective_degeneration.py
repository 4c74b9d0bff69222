"""Is selective reorth degenerating to full at production scale?

Times fused_krylov (eps=-1 -> checks run, never converge: exactly m_cap iterations) full vs selective at
n=2^22, cap 256, and a cap-128 run to separate cap-scaling.  If selective
~= full, the omega recurrence triggers ~every iteration and the policy is
buying nothing.  Run: python experiments/selective_degeneration.py
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from lanczos_tpu.ops.operators import DIAOperator
from lanczos_tpu.solvers.lanczos_fused import fused_krylov

n = 1 << 22
op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
rng = np.random.default_rng(1)
v0 = rng.uniform(-1, 1, n).astype(np.float32)
v0 = jnp.asarray(v0 / np.linalg.norm(v0))
defl = jnp.zeros((1, n), jnp.float32); mask = jnp.zeros((1,), jnp.float32)

for policy in ("selective", "full"):
    for m_cap in (128, 256):
        def run():
            r = fused_krylov(op, v0, defl, mask, 0.0, -4.0, nroot=1, m_cap=m_cap,
                             find_maximum=False, reorth_policy=policy, check_every=8)
            return np.asarray(jax.device_get(r[3]))
        run()  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
        w = float(np.median(ts))
        print(f"{policy:10s} cap={m_cap:4d}: {w:7.3f} s  ({w/m_cap*1e3:6.2f} ms/iter)", flush=True)
