"""Which formulation of the CGS projection/update runs at memory speed?

bench.py on the real chip showed the fused engine is reorthogonalization-
bound at ~4.9 ms/iter (full) for a (96, 2^20) basis — but the mandatory
traffic is only ~1.5 GB/iter (~2 ms at stream speed).  Hypothesis: the
matvec-shaped matmuls (output width 1) waste 127/128 MXU lanes, and
precision=HIGHEST multiplies the pass count on top.

Variants for one CGS pass c = B @ w ; w' = w - c @ B on (cap, n):
  mm_hi    jnp.matmul precision=HIGHEST (current linalg.py)
  mm_def   jnp.matmul default precision (accuracy-losing; timing reference)
  vpu      multiply+reduce formulations ((B * w).sum(1), (c[:,None]*B).sum(0))
  fused    single-pass w' = w - ((B*w).sum(1)[:,None] * B).sum(0) jitted whole

Run on the real chip: python experiments/cgs_formulation_bench.py
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

HI = jax.lax.Precision.HIGHEST


def sync(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def marginal(run_k, ks, kl, repeats=5):
    _ = sync(run_k(ks)); _ = sync(run_k(kl))
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = sync(run_k(ks)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = sync(run_k(kl)); tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (kl - ks))
    return float(np.median(diffs))


def main():
    cap, n = 96, 1 << 20
    rng = np.random.default_rng(0)
    basis = jnp.asarray(rng.standard_normal((cap, n)).astype(np.float32) / np.sqrt(n))
    w0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def pass_mm(b, w, prec):
        c = jnp.matmul(b, w, precision=prec)
        return w - jnp.matmul(c, b, precision=prec)

    def pass_vpu(b, w):
        c = jnp.sum(b * w[None, :], axis=1)
        return w - jnp.sum(c[:, None] * b, axis=0)

    def pass_mixed(b, w):
        # projection on VPU (exact f32, streaming), update on MXU
        c = jnp.sum(b * w[None, :], axis=1)
        return w - jnp.matmul(c, b, precision=HI)

    variants = {
        "mm_hi": lambda b, w: pass_mm(b, w, HI),
        "mm_def": lambda b, w: pass_mm(b, w, jax.lax.Precision.DEFAULT),
        "vpu": pass_vpu,
        "mixed": pass_mixed,
    }
    bytes_per_pass = 2 * cap * n * 4  # basis read twice
    out = {"backend": jax.default_backend(), "cap": cap, "n": n}
    # accuracy reference in f64
    b64 = np.asarray(basis, np.float64)
    w64 = np.asarray(w0, np.float64)
    c64 = b64 @ w64
    ref = w64 - c64 @ b64

    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(basis, w0), np.float64)
        err = float(np.max(np.abs(got - ref)))

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(b, w, k, _fn=fn):
            return jax.lax.fori_loop(0, k, lambda _, ww: _fn(b, ww) * 0.999, w)

        t = marginal(lambda k: chain(basis, w0, k), 16, 48)
        out[name] = {
            "ms_per_pass": round(t * 1e3, 3),
            "gb_per_s": round(bytes_per_pass / t / 1e9, 1),
            "abs_err_vs_f64": err,
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
