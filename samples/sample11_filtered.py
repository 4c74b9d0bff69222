"""Chebyshev-filtered Lanczos: extremal eigenpairs when reorth would dominate.

No reference counterpart — this generalizes the reference's scalar
``eigenvalue_offset`` spectral shift (reference README.md:72-83) to a
polynomial of the operator: B = T_p((A - c)/e) damps the unwanted part of
the spectrum into [-1, 1] and amplifies a mu-band at the wanted edge like
cosh(p*sqrt(2 mu / e)).  Lanczos on B converges in tens of iterations with
a tiny basis, so the dominant cost becomes the (cheap, fusable) matvec
chain instead of streaming the Krylov basis from HBM — the right trade at
production n on a TPU (see BASELINE.md).

Accuracy contract: eigenvalue error ~ mu, and the band [edge, edge+mu]
must contain every wanted eigenvalue (a miss is detected from the B-space
Ritz level and warned).
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

from lanczos_tpu import DIAOperator, filtered_lanczos

# 1D chain (free-particle hopping): analytic spectrum -2 cos(k pi / (n+1)),
# the flagship problem's shape.  At n in the millions the plain engines
# spend ~100x the matvec cost on reorthogonalization per iteration; the
# filtered solve keeps a <=48-row basis instead.
n = 1 << 14
op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
exact = sorted(-2 * np.cos((k + 1) * np.pi / (n + 1)) for k in range(n))[:3]

vals, vecs, info = filtered_lanczos(
    op,
    num_eigs=3,
    degree=200,        # filter polynomial degree: p matvecs per iteration
    mu=1e-4,           # amplified band width = eigenvalue-error budget
    lo=-2.0, hi=2.0,   # chain spectrum known analytically; omit to estimate
)

print("3 lowest eigenvalues:", [f"{v:.8f}" for v in vals])
print("errors vs analytic:  ", [f"{abs(v - e):.2e}" for v, e in zip(vals, exact)])
print("B-space iterations:  ", info["iteration_counts"], "(basis <= 48 rows)")
print("total stencil matvecs:", info["matvecs"])
print("residual norms:      ", [f"{r:.2e}" for r in info["residuals"]])
assert all(abs(v - e) < 2e-4 for v, e in zip(vals, exact))

# --- precise=True: the spectral inverse-map refinement ---------------------
# The same problem at REFERENCE-GRADE accuracy (<= 1e-12, typically
# f64-exact) from pure f32 arithmetic: the B-space solve runs with df64
# vectors and its Ritz values map back through the analytic inverse of the
# filter polynomial — the filter's steepness attenuates B-space error by
# 1/T_p' ~ 1e-5..1e-6 on the way back.  Fully automatic windowing (a scout
# pass measures the target spread).  Measured on the v5e: n=4000 chain,
# 3 lowest at the reference C++'s own eps=1e-12 problem — 1.2 s vs the
# reference's 905.5 s (BASELINE.md round-4 table).
pvals, pvecs, pinfo = filtered_lanczos(op, num_eigs=3, lo=-2.0, hi=2.0, precise=True)
print("precise eigenvalues: ", [f"{v:.15f}" for v in pvals])
print("errors vs analytic:  ", [f"{abs(v - e):.2e}" for v, e in zip(pvals, exact)])
assert all(abs(v - e) < 1e-11 for v, e in zip(pvals, exact))
