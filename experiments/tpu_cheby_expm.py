"""Chebyshev propagator vs per-step Krylov evolve on the real chip.

Scenario: the bench's evolution workload — n=2^20 chain, total time t=50
(100 steps of exp(-0.5i H) for the Krylov path; ONE 153-term chain for the
Chebyshev path).  Truth: v0 is an analytic chain eigenvector, so the exact
output is a global phase — the angle error is measurable at any n.

Run: python experiments/tpu_cheby_expm.py
"""

from __future__ import annotations

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lanczos_tpu import DIAOperator, Exponentiator
from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def main():
    n = 1 << 20
    k_mode = 3
    lam = -2.0 * np.cos(k_mode * np.pi / (n + 1))
    j = np.arange(1, n + 1, dtype=np.float64)
    v0_64 = np.sqrt(2.0 / (n + 1)) * np.sin(k_mode * np.pi * j / (n + 1))
    v0 = v0_64.astype(np.float32)
    op = DIAOperator.from_diagonals(
        [-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
    exp_eng = Exponentiator(op)

    t_total = 50.0
    a_step = -0.5j
    steps = 100

    def angle_err(o_re, o_im, ref=None):
        # ref defaults to the f32-rounded eigenvector (the f32 paths'
        # input); the precise path passes the f64 one — an f32-rounded v0
        # is only an eigenvector to ~1e-7, which floors the measurement.
        ref = v0.astype(np.float64) if ref is None else ref
        out = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        truth = np.exp(a_step * steps * lam) * (ref / np.linalg.norm(ref))
        out /= np.linalg.norm(out)
        ip = np.vdot(truth, out)
        phase = ip / abs(ip)
        return float(np.linalg.norm(out - phase * truth))

    # Krylov evolve (the current production path)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        re, im = exp_eng.evolve(a_step, v0, np.zeros_like(v0), steps)
        sync(re)
        dt = time.perf_counter() - t0
        print(f"krylov evolve {tag}: {dt:.2f}s angle {angle_err(re, im):.2e}", flush=True)

    # Chebyshev: the whole evolution in one chain
    for tag in ("cold", "warm", "warm2"):
        t0 = time.perf_counter()
        (o_re, o_im), terms = exp_eng.run_chebyshev(
            a_step * steps, v0, np.zeros_like(v0), lo=-2.0, hi=2.0)
        sync(o_re)
        dt = time.perf_counter() - t0
        print(f"chebyshev {tag}: {dt:.3f}s angle {angle_err(o_re, o_im):.2e} terms {terms}", flush=True)

    # df64 chain: f64-grade fidelity, one chain (vs evolve precise=True
    # at 128 ms/step x 100 steps = ~13 s, BASELINE round 4)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        (p_re, p_im), terms = exp_eng.run_chebyshev(
            a_step * steps, v0_64, np.zeros(n), lo=-2.0, hi=2.0,
            precise=True)
        dt = time.perf_counter() - t0
        print(f"chebyshev precise {tag}: {dt:.2f}s angle {angle_err(p_re, p_im, ref=v0_64):.2e} terms {terms}", flush=True)

    # Trajectory: 10 snapshots from ONE chain
    ts = [a_step * steps * (q + 1) / 10.0 for q in range(10)]
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        (g_re, g_im), terms = exp_eng.run_chebyshev_grid(
            ts, v0, np.zeros_like(v0), lo=-2.0, hi=2.0)
        sync(g_re)
        dt = time.perf_counter() - t0
        print(f"chebyshev grid(10) {tag}: {dt:.3f}s terms {terms} "
              f"final angle {angle_err(g_re[-1], g_im[-1]):.2e}", flush=True)


if __name__ == "__main__":
    main()
