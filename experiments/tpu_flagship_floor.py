"""Break down the flagship's fixed-cost floor (VERDICT r4 weak item 6 /
next item 5).

The n=4.19M Chebyshev-filtered flagship runs ~5.1 s warm with "no knob
left" at 89 B-space rows — but cross-session range is 2.8-5.4 s and nobody
attributed the ~3-4 s that is NOT the deflation round.  This script times
one warm flagship solve with phase timers monkeypatched around the
driver's stages:

  * build      — operator + filter construction, engine setup (host)
  * b_round    — the deflation_driver call(s): the 89-row filtered
                 while_loop solve (the "iteration" part)
  * rr         — _rayleigh_ritz: k sharded matvecs + df grams + host eigh
                 + combine
  * probe      — _missed_copy_probe: ~a dozen filter applies
  * other      — everything else (host bookkeeping, sync residue)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/tpu_flagship_floor.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

N = 1 << 22
DEGREE, MU, MR, MI = 400, 1e-5, 2, 48


def flagship(op, phases=None):
    from lanczos_tpu import filtered_lanczos

    def cfg(eng):
        eng.max_restarts = MR
        eng.max_iteration = MI

    return filtered_lanczos(op, 3, lo=-2.0, hi=2.0, degree=DEGREE, mu=MU,
                            configure=cfg)


def main():
    from lanczos_tpu import DIAOperator
    from lanczos_tpu.solvers import filtered as F
    from lanczos_tpu.solvers import lanczos as L

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    op = DIAOperator.from_diagonals(
        [-1, 1], [np.full(N, -1.0, np.float32)] * 2, N)
    build_op = time.perf_counter() - t0

    # warm pass (compile-cache load + first executions)
    t0 = time.perf_counter()
    vals, _v, info = flagship(op)
    warm = time.perf_counter() - t0
    exact = [-2.0 * np.cos((k + 1) * np.pi / (N + 1)) for k in range(3)]
    err = max(abs(float(vals[i]) - exact[i]) for i in range(3))
    print(f"warm pass {warm:.2f} s err {err:.2e} iters {info['iteration_counts']}", flush=True)

    # phase-instrumented warm passes
    phases_all = []
    real_driver = L.deflation_driver
    real_rr = F._rayleigh_ritz
    real_probe = F._missed_copy_probe

    for rep in range(4):
        ph = {"b_round": 0.0, "rr": 0.0, "probe": 0.0}

        def timed(name, fn):
            def wrap(*a, **k):
                t = time.perf_counter()
                out = fn(*a, **k)
                # host-transfer sync happens inside (device_get/np.asarray)
                ph[name] += time.perf_counter() - t
                return out
            return wrap

        F._lanczos.deflation_driver = timed("b_round", real_driver)
        F._rayleigh_ritz = timed("rr", real_rr)
        F._missed_copy_probe = timed("probe", real_probe)
        try:
            t0 = time.perf_counter()
            vals, _v, info = flagship(op)
            total = time.perf_counter() - t0
        finally:
            F._lanczos.deflation_driver = real_driver
            F._rayleigh_ritz = real_rr
            F._missed_copy_probe = real_probe
        ph["total"] = total
        ph["other"] = total - ph["b_round"] - ph["rr"] - ph["probe"]
        ph["iters"] = sum(info["iteration_counts"])
        phases_all.append(ph)
        print(json.dumps({k: round(v, 3) if isinstance(v, float) else v for k, v in ph.items()}), flush=True)

    med = {k: float(np.median([p[k] for p in phases_all]))
           for k in ("total", "b_round", "rr", "probe", "other")}
    med["build_op_s"] = build_op
    med["warm_first_s"] = warm
    med["err"] = err
    print("RESULT " + json.dumps({k: round(v, 3) for k, v in med.items()}), flush=True)


if __name__ == "__main__":
    main()
