"""Tiny-shape compile/correctness probe for the v2 single-drain CGS kernel.

The full-size run (pallas_bcgs_kernel2.py) hung >11 min with no output —
isolate whether the kernel COMPILES at all with a small (cap=257, n=2^16)
problem before burning tunnel time.  Run: python experiments/pallas_bcgs_k2_tiny.py
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

from experiments.pallas_bcgs_kernel2 import make_pass

t0 = time.perf_counter()
n = 1 << 16
cap = 257
rng = np.random.default_rng(0)
basis_np = rng.standard_normal((cap, n)).astype(np.float32)
basis_np /= np.linalg.norm(basis_np, axis=1, keepdims=True)
basis = jnp.asarray(basis_np)
v_np = rng.standard_normal(n).astype(np.float32)
v_np += basis_np[:8].sum(axis=0) * 100.0
v = jnp.asarray(v_np)
print(f"data up: {time.perf_counter()-t0:.1f} s", flush=True)

p = make_pass(64, 2048, cap)
t0 = time.perf_counter()
got = np.asarray(p(v, basis, 100), np.float64)
print(f"first call (compile): {time.perf_counter()-t0:.1f} s", flush=True)

b = np.asarray(basis, np.float64); vv = np.asarray(v, np.float64)
m = (np.arange(cap) < 100)
ref = vv - ((b @ vv) * m) @ b
print(f"rel err vs f64 CGS: {np.abs(got-ref).max()/np.abs(v_np).max():.2e}", flush=True)
