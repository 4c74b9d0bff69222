"""Quantum time evolution with the Krylov exponentiator
(reference: README.md:84-89 and test/exponentiator_test.cpp:106-162).

Evolve a localized wavepacket under a 1D tight-binding Hamiltonian:
    psi(t) = exp(-i H t) psi(0),   H = -sum_i (|i><i+1| + |i+1><i|)
The Krylov method needs ~20 matvecs per step and preserves the norm to
machine precision.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

_platform = os.environ.get("LT_SAMPLE_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
import jax

jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from lanczos_tpu import Exponentiator, DIAOperator

n = 200
h = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0), np.full(n, -1.0)], n)

psi = np.zeros(n, dtype=complex)
psi[n // 2] = 1.0  # localized start

expo = Exponentiator(h, dtype=jnp.complex128)
dt = 0.5
for step in range(5):
    psi, iters = expo.run(-1j * dt, jnp.asarray(psi))
    norm = float(jnp.linalg.norm(psi))
    spread = float(jnp.sum(jnp.abs(psi) ** 2 * (jnp.arange(n) - n // 2) ** 2) ** 0.5)
    print(f"t={dt * (step + 1):4.1f}  norm={norm:.15f}  spread={spread:7.3f}  krylov_iters={iters}")

# TPU-native path: the same evolution fully device-resident and in REAL
# arithmetic (split complex — complex dtypes are unavailable on some TPU
# runtimes): all steps in ONE jitted program, zero host syncs between steps.
expo_r = Exponentiator(h, dtype=jnp.float64)
start = np.zeros(n)
start[n // 2] = 1.0
out_re, out_im = expo_r.evolve(-1j * dt, start, np.zeros(n), steps=5, krylov_dim=14)
norm = float(jnp.sqrt(jnp.sum(out_re**2) + jnp.sum(out_im**2)))
overlap = abs(np.vdot(np.asarray(psi), np.asarray(out_re) + 1j * np.asarray(out_im)))
print(f"device-resident evolve: norm={norm:.12f}, overlap with step-by-step={overlap:.12f}")


# Precise (df64) evolution: f64-grade fidelity on f32 storage.  The f32
# evolve drifts ~1e-7 in state angle per step (invisible to the overlap
# metric, which is quadratic in angle); precise=True carries the state and
# the whole per-step Krylov pipeline as double-float word pairs and returns
# host f64 arrays (measured on chip: 3.1e-12 angle error after 100 steps at
# n=2^20 — solvers/exponentiator_precise.py).
h32 = DIAOperator.from_diagonals(
    [-1, 1], [np.full(n, -1.0, np.float32), np.full(n, -1.0, np.float32)], n
)
expo_p = Exponentiator(h32, dtype=jnp.float32)
pre_re, pre_im = expo_p.evolve(-1j * dt, start, np.zeros(n), steps=5, krylov_dim=14, precise=True)
overlap_p = abs(np.vdot(np.asarray(psi), pre_re + 1j * pre_im))
print(f"precise (df64) evolve:  dtype={pre_re.dtype}, overlap with f64 step-by-step={overlap_p:.12f}")


# Chebyshev propagator: the WHOLE evolution as one ~|t*e|-term matvec chain
# (solvers/cheby_expm.py, no reference counterpart) — no per-step Krylov
# builds, O(1) extra memory, and a grid of times shares one chain.  Measured
# on the v5e at n=2^20, total time t=50: 0.17 s (f32, angle 3.0e-7) and
# 0.97 s (precise=True df64 chain, angle 3.9e-14) vs 1.3-1.4 s / 8.3e-7 for
# the 100-step Krylov evolve (BASELINE.md round 4).
(ch_re, ch_im), n_terms = expo_p.run_chebyshev(
    -1j * dt * 5, start, lo=-2.0, hi=2.0)
overlap_c = abs(np.vdot(np.asarray(psi), np.asarray(ch_re) + 1j * np.asarray(ch_im)))
print(f"chebyshev chain:        {n_terms} terms, overlap with step-by-step={overlap_c:.12f}")
(traj_re, traj_im), _ = expo_p.run_chebyshev_grid(
    [-1j * dt * (s + 1) for s in range(5)], start, lo=-2.0, hi=2.0)
print(f"chebyshev trajectory:   {traj_re.shape[0]} snapshots from one chain")
