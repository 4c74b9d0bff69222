"""Budget the full-reorth fused iteration at n=2^20 (VERDICT r2 item 4).

BENCH_r02 recorded 2,650 us/iter for reorth_policy='full' vs a ~22 us DIA
matvec — ~50x.  This experiment measures the marginal per-iteration cost of
each loop component on the real chip so the number can be either optimized
or roofline-justified in BASELINE.md.

Traffic model (n=2^20 f32, 4 MiB/vector, r+w stream 733 GB/s, cap=96,
average live rows over the measured 32->96 window k~64):

  matvec (DIA, 3 streams + write) ......... 16 MiB  ~  22 us
  recurrence AXPYs + dots ................. ~7 vec  ~  40 us
  CGS pass, Pallas single-drain ........... k rows  ~ 280 us/pass (954 GB/s)
  CGS pass, fori chunk walk ............... 2k rows ~ 560 us/pass (project
                                            + update each stream the chunk)
  Sturm convergence check ................. measured per call, /check_every

Variants (all through ONE compiled _fused_stage per config; k_limit is a
dynamic operand so the 32- and 96-iteration chains share the compile):
  selective + no checks      -> base loop
  selective + check_every=4  -> + Sturm/4
  full p=2  + no checks      -> + 2 CGS passes
  full p=2  + check_every=4  -> BENCH headline config
  full p=1  + check_every=4  -> reference-parity single pass (the reference
                                full reorth is ONE schmidt_orth sweep,
                                lambda_lanczos.hpp:259-260)
  full p=2  + check_every=8  -> cheaper amortization

Run:  python experiments/fused_iter_breakdown.py            (Pallas CGS)
      LANCZOS_TPU_NO_PALLAS_CGS=1 python ... (fori-loop CGS for the A/B)
"""

from __future__ import annotations

import json
import os
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

    from lanczos_tpu.ops.operators import DIAOperator
    from lanczos_tpu.solvers.lanczos_fused import _fused_stage, _init_state
    from lanczos_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << 20
    cap = 96
    op = DIAOperator.from_diagonals(
        [-1, 1], [jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32)], n
    )
    v0 = jax.jit(
        lambda k: (lambda u: u / jnp.linalg.norm(u))(
            jax.random.uniform(k, (n,), jnp.float32, -1.0, 1.0)
        )
    )(jax.random.PRNGKey(1))
    defl = jnp.zeros((1, n), jnp.float32)
    mask = jnp.zeros((1,), jnp.float32)

    variants = {
        "full_p0_nocheck": dict(policy="full", passes=0, check=1 << 30),
        "selective_nocheck": dict(policy="selective", passes=1, check=1 << 30),
        "selective_c4": dict(policy="selective", passes=1, check=4),
        "full_p2_nocheck": dict(policy="full", passes=2, check=1 << 30),
        "full_p2_c4": dict(policy="full", passes=2, check=4),
        "full_p1_c4": dict(policy="full", passes=1, check=4),
        "full_p1_nocheck": dict(policy="full", passes=1, check=1 << 30),
        "full_p2_c8": dict(policy="full", passes=2, check=8),
    }

    out = {"pallas_disabled": bool(os.environ.get("LANCZOS_TPU_NO_PALLAS_CGS"))}
    for name, v in variants.items():
        def run(k_lim, v=v):
            state = _init_state(v0, cap, 1)
            # eps=-1: benchmark sentinel (checks run, never converge);
            # eps=0 would skip the Sturm scan the c4/c8 variants measure.
            state = _fused_stage(
                op, state, defl, mask, -1.0, 0.0, 1, False,
                jnp.asarray(v["check"], jnp.int32), v["passes"], v["policy"],
                False, False, k_limit=jnp.asarray(k_lim, jnp.int32),
            )
            return state.alpha

        t = marginal(run, 32, 96)
        out[name] = round(t * 1e6, 1)
        print(f"{name}: {out[name]} us/iter", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
