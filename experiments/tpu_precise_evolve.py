"""Precise (df64) evolve on the real chip: cost + 100-step drift at n=2^20.

Round-4 measurement for the precise exponentiator
(solvers/exponentiator_precise.py): wall per step vs the f32 evolve, and
the 100-step vector-level angle error vs the DST-I analytic truth (same
protocol as bench.py sec_expm_evolve).

Run: python experiments/tpu_precise_evolve.py [n_pow] [steps] [m]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp
from scipy.fft import dst

from lanczos_tpu import DIAOperator, Exponentiator
from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    npow = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n = 1 << npow
    op = DIAOperator.from_diagonals(
        [-1, 1], [jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32)], n
    )
    rng = np.random.default_rng(7)
    v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    v /= np.linalg.norm(v)
    lam = -2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    coef = dst(v, type=1, norm="ortho")
    truth = dst(np.exp(1j * 0.05 * steps * lam) * coef, type=1, norm="ortho")
    tn = truth / np.linalg.norm(truth)

    ex = Exponentiator(op, dtype=np.float32)

    def angle(out):
        on = out / np.linalg.norm(out)
        ip = np.vdot(tn, on)
        return float(np.linalg.norm(on - (ip / abs(ip)) * tn))

    for tag, kw in (("f32", {}), ("precise", {"precise": True})):
        t0 = time.perf_counter()
        re, im = ex.evolve(0.05j, v.real, v.imag, steps, krylov_dim=m, **kw)
        _sync = np.asarray(re if isinstance(re, np.ndarray) else re.ravel()[0])
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        re, im = ex.evolve(0.05j, v.real, v.imag, steps, krylov_dim=m, **kw)
        out = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
        warm = time.perf_counter() - t0
        print(f"{tag}: cold {cold:.1f}s warm {warm:.2f}s ({warm/steps*1e3:.1f} ms/step) angle_err {angle(out):.3e}", flush=True)


if __name__ == "__main__":
    main()
