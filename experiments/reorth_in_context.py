"""Reorthogonalization cost INSIDE a realistic fused iteration loop.

The chained-jit kernel benchmarks (pallas_bcgs_kernel2.py) show the Pallas
single-drain CGS pass beating the fori-loop BCGS 728-954 vs 639-664 GB/s,
yet the flagship wall time barely moved (62.1 vs ~61 s).  This experiment
times a while_loop whose body is the real iteration skeleton — DIA matvec,
alpha dot, 3-term AXPYs, reorth, norm, basis-row write — at flagship scale
(n=2^22, cap=257) with a RAMPING live count k (like a thick-restart cycle),
with the reorth formulation switchable, so the in-context delta is measured
directly.

Run: python experiments/reorth_in_context.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from lanczos_tpu.core import linalg  # noqa: E402
from lanczos_tpu.ops import pallas_cgs  # noqa: E402
from lanczos_tpu.ops.operators import DIAOperator  # noqa: E402


def marginal(run_k, ks, kl, repeats=5):
    _ = np.asarray(run_k(ks).ravel()[0])
    _ = np.asarray(run_k(kl).ravel()[0])
    ds = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = np.asarray(run_k(ks).ravel()[0]); a = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = np.asarray(run_k(kl).ravel()[0]); b = time.perf_counter() - t0
        ds.append((b - a) / (kl - ks))
    return float(np.median(ds))


def fori_pass(v, basis, k, passes):
    chunk = 64
    cap_rows = basis.shape[0]
    k = jnp.asarray(k, jnp.int32)
    nchunks = (k + chunk - 1) // chunk
    idx = jnp.arange(chunk)

    def one_pass(v):
        def body(ci, v):
            start = jnp.minimum(ci * chunk, cap_rows - chunk)
            rows = jax.lax.dynamic_slice_in_dim(basis, start, chunk, axis=0)
            rmask = (start + idx) < k
            c = linalg._project_coeffs(rows, v, rmask)
            return v - jnp.matmul(c, rows, precision=jax.lax.Precision.HIGHEST)

        return jax.lax.fori_loop(0, nchunks, body, v)

    for _ in range(passes):
        v = one_pass(v)
    return v


def main():
    n = 1 << 22
    cap = 257
    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
    key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (n,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)
    u_buf0 = jnp.zeros((cap, n), jnp.float32).at[0].set(v0)

    def make_loop(mode, passes=1):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(u_buf, iters):
            def cond(st):
                return st[1] < iters

            def body(st):
                u_buf, i, acc = st
                k = jnp.maximum(i % (cap - 1), 1)  # ramping live count
                u_prev = jax.lax.dynamic_index_in_dim(u_buf, k - 1, axis=0, keepdims=False)
                au = op.matvec(u_prev)
                alpha_k = jnp.real(linalg.inner_prod(u_prev, au))
                w = au - alpha_k * u_prev
                if mode == "none":
                    pass
                elif mode == "fori":
                    w = fori_pass(w, u_buf, k, passes)
                elif mode == "pallas":
                    for _ in range(passes):
                        w = pallas_cgs.cgs_pass(w, u_buf, k)
                elif mode == "auto":
                    w = linalg.orthogonalize_bcgs_dyn(w, u_buf, k, passes=passes)
                elif mode.startswith("cond"):
                    # cond-gated reorth at a controlled trigger rate r/10
                    # (the selective policy's lax.cond shape).
                    _, form, rs = mode.split("-")
                    trigger = (i % 10) < int(rs)
                    if form == "fori":
                        w = jax.lax.cond(trigger, lambda w: fori_pass(w, u_buf, k, passes), lambda w: w, w)
                    else:
                        w = jax.lax.cond(trigger, lambda w: pallas_cgs.cgs_pass(w, u_buf, k), lambda w: w, w)
                beta_k = linalg.norm(w)
                u_buf = jax.lax.dynamic_update_slice_in_dim(
                    u_buf, (w / jnp.maximum(beta_k, 1e-30))[None], k, axis=0
                )
                return (u_buf, i + 1, acc + alpha_k * 1e-20)

            st = jax.lax.while_loop(cond, body, (u_buf, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32)))
            return st[2][None]

        return run

    import os
    default = "cond-fori-10,cond-pallas-10,cond-fori-5,cond-pallas-5,none,fori,pallas"
    modes = os.environ.get("REORTH_MODES", default).split(",")
    for mode in modes:
        run = make_loop(mode, passes=1)
        t = marginal(lambda it: run(u_buf0, iters=it), 64, 192)
        print(f"{mode:15s}: {t*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
