"""Round-5 production features: df-grade eigenvectors, checkpoint/resume,
and complex-Hermitian solves through the filtered path.

The reference asserts BOTH tolerances — eigenvalues within |lambda|*eps and
eigenvectors elementwise within |lambda|*eps*10
(/root/reference/test/lambda_lanczos_test.cpp:156-159).  Round 4's
inverse-map refinement met the value bar from f32 hardware; this sample
shows the round-5 pieces that complete the picture:

* ``filtered_lanczos(precise=True)`` now refines eigenVECTORS to the df
  floor by default (df64 filter-subspace iteration, ~1.4x the wall),
* ``checkpoint_path=`` makes the multi-round solve preemption-safe,
* ``solve_hermitian(method="filtered", precise=True)`` brings the same
  accuracy to complex Hermitian operators via the real embedding.
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
import tempfile

import numpy as np
import jax.numpy as jnp

from lanczos_tpu import DIAOperator, DenseOperator, filtered_lanczos

# --- df-grade eigenpairs (values AND vectors) from f32 storage -------------
n = 2000
op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
with tempfile.TemporaryDirectory() as tmp:
    vals, vecs, info = filtered_lanczos(
        op, num_eigs=3, lo=-2.0, hi=2.0, precise=True,
        checkpoint_path=os.path.join(tmp, "solve_state"),  # resume-safe
    )
exact = [-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(3)]
print("eigenvalue errors:", [f"{abs(float(vals[i]) - exact[i]):.2e}" for i in range(3)])
print("vector residuals: ", [f"{r:.2e}" for r in info["residuals"]],
      f"({info['refine_sweeps']} refinement sweeps)")
assert max(abs(float(vals[i]) - exact[i]) for i in range(3)) < 1e-12
assert max(info["residuals"]) < 1e-10  # reference's eigenvector bar, f32 chip

# --- complex Hermitian at the same accuracy --------------------------------
from lanczos_tpu.ops.hermitian_split import solve_hermitian

rng = np.random.default_rng(0)
m = 80
H = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
H = (H + H.conj().T) / 2
Hr = np.real(H).astype(np.float32)
Hi = np.imag(H).astype(np.float32)
H64 = Hr.astype(np.float64) + 1j * Hi.astype(np.float64)
H64 = (H64 + H64.conj().T) / 2
hvals, hvecs = solve_hermitian(
    DenseOperator(jnp.asarray(Hr), m), DenseOperator(jnp.asarray(Hi), m),
    num_eigs=2, method="filtered", precise=True)
w_true = np.linalg.eigvalsh(H64)
print("hermitian value errors:", [f"{abs(np.sort(hvals)[i] - w_true[i]):.2e}" for i in range(2)])
hres = [float(np.linalg.norm(H64 @ hvecs[i] - hvals[i] * hvecs[i])) for i in range(2)]
print("hermitian residuals:   ", [f"{r:.2e}" for r in hres])
assert max(abs(np.sort(hvals)[i] - w_true[i]) for i in range(2)) < 1e-10
assert max(hres) < 1e-10
print("sample12 OK")
