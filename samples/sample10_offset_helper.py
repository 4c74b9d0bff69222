"""Eigenvalue-offset helper workflow: pick a shift, then solve.

The reference ships this as a standalone demo program computing the
infinity-norm Gershgorin bound ``max_i sum_j |a_ij|`` as a suggested
``eigenvalue_offset``
(reference src/determine_eigenvalue_offset/determine_eigenvalue_offset.cpp:12-49).
Here the same workflow is library functions: per-format Gershgorin bounds
for structured operators, a matrix-free power bound for callables, and
``suggest_eigenvalue_offset`` picking the sign for the end you want.

Why offsets matter (reference README.md:72-83): Lanczos converges toward the
LARGEST-|lambda| end; shifting by -r (r >= spectral radius) makes the
minimum eigenvalue the extremal one, so ``find_maximum=False`` solves
converge in far fewer iterations.
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

from lanczos_tpu import LambdaLanczos, DIAOperator, FunctionOperator
from lanczos_tpu.utils.estimate import (
    gershgorin_bound,
    power_bound,
    suggest_eigenvalue_offset,
)

# --- 1. structured operator: exact Gershgorin bound (the reference demo) ---
n = 1000
op = DIAOperator.from_diagonals(
    [-1, 1], [np.full(n, -1.0), np.full(n, -1.0)], n
)
r = gershgorin_bound(op)
print(f"Gershgorin bound (max row sum of |a_ij|): {r}")  # chain: 2.0

off = suggest_eigenvalue_offset(op, find_maximum=False)
print(f"suggested offset for the MINIMUM end: {off}")  # -2.0ish

eng = LambdaLanczos(op, find_maximum=False)
eng.eigenvalue_offset = off
eng.eps = 1e-12
val, vec = eng.run_one()
exact = -2 * np.cos(np.pi / (n + 1))
print(f"min eigenvalue: {val:.12f}  (exact {exact:.12f}, "
      f"{eng.iteration_counts[0]} iterations)")
assert abs(val - exact) < 1e-9

# --- 2. matrix-free operator: power-iteration bound --------------------------
def matmul(x):
    y = jnp.zeros_like(x)
    y = y.at[:-1].add(-1.0 * x[1:])
    y = y.at[1:].add(-1.0 * x[:-1])
    return y

fop = FunctionOperator(matmul, n, np.float64)
rho = power_bound(fop, iters=30, seed=7)
print(f"matrix-free power bound on the spectral radius: {rho:.6f}")
assert rho >= 1.9  # true radius ~2

# Without an offset the same solve needs many more iterations:
eng0 = LambdaLanczos(op, find_maximum=False)
eng0.eps = 1e-12
val0, _ = eng0.run_one()
print(f"no offset: {eng0.iteration_counts[0]} iterations "
      f"(vs {eng.iteration_counts[0]} with the suggested offset)")
