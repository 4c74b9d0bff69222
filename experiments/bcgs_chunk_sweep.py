"""Chunk-size sweep for orthogonalize_bcgs_dyn at production scale.

Times K back-to-back BCGS2 calls inside one jit (marginal method) against a
(257, 2^22) f32 basis for live counts k in {64, 128, 256} and chunks
{16, 32, 64, 128, 257(=monolithic)}.  Run: python experiments/bcgs_chunk_sweep.py
"""
import functools, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from lanczos_tpu.core import linalg

n, cap = 1 << 22, 256
rng = np.random.default_rng(0)
basis = jnp.asarray(rng.standard_normal((cap + 1, n)).astype(np.float32) / np.sqrt(n))
v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

def marginal(run_k, ks, kl, repeats=3):
    _ = np.asarray(run_k(ks).ravel()[0]); _ = np.asarray(run_k(kl).ravel()[0])
    ds = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = np.asarray(run_k(ks).ravel()[0]); a = time.perf_counter()-t0
        t0 = time.perf_counter(); _ = np.asarray(run_k(kl).ravel()[0]); b = time.perf_counter()-t0
        ds.append((b - a) / (kl - ks))
    return float(np.median(ds))

for k_live in (64, 128, 256):
    for chunk in (16, 32, 64, 128, 257):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(basis, v, k, reps):
            def body(i, v):
                out = linalg.orthogonalize_bcgs_dyn(v, basis, k, chunk=chunk)
                return out / jnp.maximum(jnp.max(jnp.abs(out)), 1e-30)
            return jax.lax.fori_loop(0, reps, body, v)
        t = marginal(lambda r: run(basis, v, k_live, reps=r), 4, 12)
        print(f"k={k_live:3d} chunk={chunk:3d}: {t*1e3:7.2f} ms/BCGS2", flush=True)
