"""Chunk-size sweep for the Pallas CGS pass at the bench regime (cap=96,
n=2^20): chunk-64 rounding reads ceil(k/64)*64 rows per phase — at an
average live count k~64 over the measured 32->96 window that is ~96 rows,
i.e. ~50% dead traffic.  Smaller chunks cut the rounding waste at the cost
of more grid steps.

Run: python experiments/cgs_chunk_sweep_cap96.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def marginal(run, k_short, k_long, repeats=3):
    _ = np.asarray(run(k_short).ravel()[0])
    _ = np.asarray(run(k_long).ravel()[0])
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(run(k_short).ravel()[0])
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(run(k_long).ravel()[0])
        tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (k_long - k_short))
    return float(np.median(diffs))


def main():
    import jax
    import jax.numpy as jnp

    from lanczos_tpu.ops import pallas_cgs
    from lanczos_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << 20
    cap = 97  # the cap-96 engine's u_buf row count
    key = jax.random.PRNGKey(0)
    basis = jax.jit(lambda k: jax.random.normal(k, (cap, n), jnp.float32) / np.sqrt(n))(key)
    v = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))(jax.random.PRNGKey(1))

    out = {}
    import functools

    for chunk in (64, 32, 16, 8):
        # Chain passes with ramping live counts 32..96 (the engine's window)
        # so the marginal cost reflects the real row distribution.  basis/v
        # are jit ARGUMENTS (a closure would bake 400 MB into the HLO and
        # stall the remote compile — CLAUDE.md).
        @functools.partial(jax.jit, static_argnames=("m", "chunk"))
        def run(basis, v, m, chunk):
            def body(i, vv):
                kk = 32 + (i % 64)
                return pallas_cgs.cgs_pass(vv, basis, kk, chunk=chunk)
            return jax.lax.fori_loop(0, m, body, v)

        t = marginal(lambda m, c=chunk: run(basis, v, m, c), 16, 48)
        out[f"chunk{chunk}_us_per_pass"] = round(t * 1e6, 1)
        print(f"chunk={chunk}: {out[f'chunk{chunk}_us_per_pass']} us/pass", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
