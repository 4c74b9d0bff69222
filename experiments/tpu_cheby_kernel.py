"""Time-tiled Chebyshev chain kernel vs the lax.scan path on the real chip.

Round 4: correctness (rel err vs the scan recurrence) and wall per filter
application at the flagship scale (n=2^22, degree=400).

Run: python experiments/tpu_cheby_kernel.py [degree] [s]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lanczos_tpu.ops.operators import DIAOperator
from lanczos_tpu.ops.filters import ChebyshevFilterOperator
from lanczos_tpu.ops.pallas_cheby import cheby_chain_apply
from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    degree = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = 1 << 22
    op = DIAOperator.from_diagonals(
        [-1, 1], [jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32)], n
    )
    filt = ChebyshevFilterOperator.from_interval(op, degree, -2.0, 2.0, 1e-5)
    x = jax.jit(lambda k: (lambda u: u / jnp.linalg.norm(u))(
        jax.random.uniform(k, (n,), jnp.float32, -1, 1)))(jax.random.PRNGKey(0))

    # use_fused=False is also the shipped DEFAULT (the kernel measured at
    # parity and stayed opt-in) — pinned here so this A/B keeps comparing
    # scan-vs-kernel even if the default ever flips
    scan_f = jax.jit(lambda d, xx, c, e: ChebyshevFilterOperator(
        DIAOperator(op.offsets, d, n), c, e, degree, use_fused=False).matvec(xx))
    kern_f = jax.jit(lambda d, xx, c, e: cheby_chain_apply(
        d, op.offsets, xx, c, e, degree, s=s))

    y_scan = scan_f(op.data, x, filt.c, filt.e)
    _ = np.asarray(y_scan.ravel()[0])
    y_kern = kern_f(op.data, x, filt.c, filt.e)
    _ = np.asarray(y_kern.ravel()[0])
    ys = np.asarray(y_scan, np.float64)
    yk = np.asarray(y_kern, np.float64)
    rel = float(np.max(np.abs(yk - ys)) / np.max(np.abs(ys)))
    print(f"rel err kernel vs scan: {rel:.3e}", flush=True)

    for name, f in (("scan", scan_f), ("kernel", kern_f)):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            y = f(op.data, x, filt.c, filt.e)
            _ = np.asarray(y.ravel()[0])
            times.append(time.perf_counter() - t0)
        print(f"{name}: median {np.median(times)*1e3:.1f} ms/apply (times {[f'{t*1e3:.0f}' for t in times]})", flush=True)


if __name__ == "__main__":
    main()
