"""Where does the fused-engine iteration go on the real chip?

bench.py measures ~3.37 ms/iter (full reorth, n=2^20, cap 32->96 marginal)
while the mandatory CGS2 traffic is ~1.8 ms and the matvec ~50 us.  This
probe isolates the rest by toggling one knob at a time:

  base        check_every=1, reorth_passes=2, full   (the bench config)
  check8      check_every=8                  -> isolates the device Sturm
  check32     check_every=32                   convergence-test cost
  pass1       reorth_passes=1                -> isolates one CGS pass
  selective   omega-recurrence policy        -> the adaptive path

Run on the real chip: python experiments/fused_iter_split.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


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
    from lanczos_tpu.ops.operators import DIAOperator
    from lanczos_tpu.solvers.lanczos_fused import fused_krylov

    n = 1 << 20
    m_s, m_l = 32, 96
    op = DIAOperator.from_diagonals(
        [-1, 1], [np.full(n, -1.0, np.float32), np.full(n, -1.0, np.float32)], n
    )
    rng = np.random.default_rng(1)
    v0 = rng.uniform(-1, 1, n).astype(np.float32)
    v0 = jnp.asarray(v0 / np.linalg.norm(v0))
    defl = jnp.zeros((1, n), jnp.float32)
    mask = jnp.zeros((1,), jnp.float32)

    variants = {
        "base": dict(check_every=1, reorth_policy="full"),
        "check8": dict(check_every=8, reorth_policy="full"),
        "check32": dict(check_every=32, reorth_policy="full"),
        "selective": dict(check_every=1, reorth_policy="selective"),
        "selective_check8": dict(check_every=8, reorth_policy="selective"),
    }
    out = {"backend": jax.default_backend(), "n": n}
    for name, kw in variants.items():
        def run(m_cap, kw=kw):
            r = fused_krylov(
                op, v0, defl, mask, -1.0, 0.0,  # eps=-1: checks run, never converge (eps=0 now SKIPS checks)
                nroot=1, m_cap=m_cap, find_maximum=False, **kw,
            )
            return r[3]

        t = marginal(lambda m, _r=run: _r(m), m_s, m_l, repeats=3)
        out[name] = round(t * 1e6, 1)
        print(name, out[name], "us/iter", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
