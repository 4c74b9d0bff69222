"""Per-component anatomy of one fused selective-reorth Lanczos iteration.

bench.py measures ~1.2 ms/iter (selective) at n=2^20, cap=96 on the v5e —
far above the sum of the obvious traffic terms (matvec ~16 us + AXPYs
~30 us).  This experiment times a ladder of while_loops, each adding one
component of the real loop body, with the marginal long-vs-short method,
so the gap shows up as a named line item.

Run on the chip:  python experiments/fused_iter_anatomy.py [n_log2=20] [cap=96]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from lanczos_tpu.core import linalg, tridiagonal  # noqa: E402
from lanczos_tpu.ops.operators import DIAOperator  # noqa: E402


def marginal(run_k, k_short, k_long, repeats=5):
    _ = np.asarray(run_k(k_short).ravel()[0])
    _ = np.asarray(run_k(k_long).ravel()[0])
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k_short).ravel()[0])
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k_long).ravel()[0])
        tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (k_long - k_short))
    return float(np.median(diffs))


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    n = 1 << n_log2
    rdtype = np.float32

    op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, rdtype)] * 2, n)
    rng = np.random.default_rng(0)
    v0 = rng.standard_normal(n).astype(rdtype)
    v0 = jnp.asarray(v0 / np.linalg.norm(v0))
    defl = jnp.zeros((1, n), rdtype)
    dmask = jnp.zeros((1,), rdtype)
    u_buf0 = jnp.zeros((cap + 1, n), rdtype).at[0].set(v0)

    # Each level is a while_loop with (u_buf, alpha, beta, k, acc) carry; the
    # levels add components cumulatively.  `acc` folds a scalar through so
    # nothing is dead-code eliminated.
    def make_loop(level):
        @functools.partial(jax.jit, static_argnames=("k_iters",))
        def run(u_buf, a0, b0, k_iters):
            def cond(st):
                return st[3] < k_iters

            def body(st):
                u_buf, alpha, beta, k, acc = st
                u_prev = jax.lax.dynamic_index_in_dim(u_buf, k % cap, axis=0, keepdims=False)
                u_pp = jax.lax.dynamic_index_in_dim(u_buf, jnp.maximum(k % cap - 1, 0), axis=0, keepdims=False)
                au = op.matvec(u_prev)
                w = au
                if level >= 1:  # alpha inner product
                    alpha_k = jnp.real(linalg.inner_prod(u_prev, au)).astype(rdtype)
                    acc = acc + alpha_k
                else:
                    alpha_k = jnp.asarray(0.01, rdtype)
                if level >= 2:  # three-term recurrence AXPYs
                    b = jax.lax.dynamic_index_in_dim(beta, jnp.maximum(k % cap - 1, 0), keepdims=False)
                    w = au - alpha_k * u_prev - b * u_pp
                if level >= 3:  # deflation CGS2 (1 masked row, 2 passes)
                    w = linalg.orthogonalize_cgs2(w, defl, dmask, passes=2)
                if level >= 4:  # norm + scalar buffer writes
                    beta_k = linalg.norm(w).astype(rdtype)
                    alpha = jax.lax.dynamic_update_slice_in_dim(alpha, alpha_k[None], k % cap, axis=0)
                    beta = jax.lax.dynamic_update_slice_in_dim(beta, beta_k[None], k % cap, axis=0)
                else:
                    beta_k = jnp.asarray(1.0, rdtype)
                if level >= 5:  # omega recurrence (cap-sized vector ops)
                    om = (beta * acc + alpha * 1e-9) / jnp.maximum(beta_k, 1e-30)
                    acc = acc + jnp.max(jnp.abs(om)) * 1e-20
                if level >= 6:  # basis row write (the DUS carry copy)
                    u_buf = jax.lax.dynamic_update_slice_in_dim(
                        u_buf, (w / jnp.maximum(beta_k, 1e-30))[None], (k + 1) % (cap + 1), axis=0
                    )
                else:
                    acc = acc + jnp.sum(w) * 1e-30
                if level >= 7:  # throttled device Sturm check (every 4)
                    def with_check(_):
                        evs = tridiagonal.extremal_eigenvalues_device(alpha, beta, jnp.maximum(k, 1), 1, False)
                        return evs[0]

                    ev = jax.lax.cond((k % 4) == 0, with_check, lambda _: acc, None)
                    acc = acc + ev * 1e-20
                return (u_buf, alpha, beta, k + 1, acc)

            st = (u_buf, jnp.full((cap,), a0), jnp.full((cap,), b0), jnp.asarray(0, jnp.int32), jnp.asarray(0.0, rdtype))
            st = jax.lax.while_loop(cond, body, st)
            return st[4][None]

        return run

    names = [
        "matvec only",
        "+ alpha inner_prod",
        "+ 3-term AXPYs",
        "+ deflation CGS2",
        "+ norm & scalar DUS",
        "+ omega recurrence",
        "+ basis row DUS",
        "+ Sturm check /4",
    ]
    out = {"n": n, "cap": cap}
    prev = 0.0
    for level, name in enumerate(names):
        run = make_loop(level)
        t = marginal(lambda k: run(u_buf0, 0.01, 0.9, k_iters=k), 64, 192)
        out[name] = {"us_per_iter": round(t * 1e6, 1), "delta_us": round((t - prev) * 1e6, 1)}
        prev = t
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
