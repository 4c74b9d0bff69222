"""Probe: does plain float64 work on the TPU (software-emulated), and what
does it cost vs f32?

Informs the round-2 accuracy strategy (VERDICT item 1): if emulated f64 is
usable, it is the guaranteed path to the reference's 1e-12 tolerances on
chip; the df64 fused engine is then the *fast* path and we can quantify the
multiplier between the two.

Run on the real chip:  python experiments/tpu_f64_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from lanczos_tpu.ops.operators import DIAOperator  # noqa: E402
from lanczos_tpu.api import LambdaLanczos  # noqa: E402


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def marginal(run_k, ks, kl, repeats=5):
    _ = sync(run_k(ks))
    _ = sync(run_k(kl))
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = sync(run_k(ks)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = sync(run_k(kl)); tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (kl - ks))
    return float(np.median(diffs))


def main():
    out = {"backend": jax.default_backend(), "x64": True}

    # --- 1. matvec cost: f32 vs f64 on a 2^20 stencil --------------------
    import functools

    n = 1 << 20
    for dt, key in ((np.float32, "f32"), (np.float64, "f64")):
        off = np.full(n, -1.0, dt)
        op = DIAOperator.from_diagonals([-1, 1], [off, off], n)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(d, v, k, _op=op):
            o = DIAOperator(_op.offsets, d, _op.n)
            return jax.lax.fori_loop(0, k, lambda _, vv: o.matvec(vv) * 0.49, v)

        v = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(dt))
        try:
            t = marginal(lambda k: chain(op.data, v, k), 32, 160)
            out[f"matvec_{key}_us"] = round(t * 1e6, 2)
        except Exception as e:  # noqa: BLE001
            out[f"matvec_{key}_error"] = repr(e)[:300]

    # --- 2. full n=1024 chain solve at f64 on chip ------------------------
    n2 = 1024
    for dt, key in ((np.float64, "solve_f64"), (np.float32, "solve_f32")):
        off = np.full(n2, -1.0, dt)
        op2 = DIAOperator.from_diagonals([-1, 1], [off, off], n2)
        eng = LambdaLanczos(op2, find_maximum=False, num_eigs=4, dtype=dt)
        eng.mode = "fused"
        exact = np.sort(-2.0 * np.cos(np.pi * np.arange(1, n2 + 1) / (n2 + 1)))[:4]
        try:
            t0 = time.perf_counter()
            vals, vecs = eng.run()
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            vals, vecs = eng.run()
            t2 = time.perf_counter() - t0
            err = float(np.max(np.abs(np.sort(np.asarray(vals)) - exact)))
            out[key] = {
                "max_eig_err": err,
                "first_run_s": round(t1, 2),
                "second_run_s": round(t2, 2),
                "iters": eng.iteration_counts,
            }
        except Exception as e:  # noqa: BLE001
            out[key] = {"error": repr(e)[:300]}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
