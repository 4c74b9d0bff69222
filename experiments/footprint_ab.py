"""Footprint vs gather halo A/B on the 8-virtual-device CPU mesh
(VERDICT r4 next item 2's "8-device CPU-mesh A/B").

Honest framing up front: on the virtual CPU mesh the collective costs
~1-5% of the matvec (measured, experiments/cpu_mesh_scaling.py), so a
wall-clock A/B here mostly measures noise — the BANDWIDTH claim is the
jaxpr comm-volume assertion (tests/test_transfer_guard.py: words moved =
sum_h F_h*bk ∝ touched remote columns, vs n for gather).  This script
records both: the per-matvec comm words (exact, from the packed schedule)
and the chain rate (context).

Pattern: chain + sparse long-range couplings (the footprint target shape);
n=2^18, 8 shards, footprint moves ~0.2% of the gather volume.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python experiments/footprint_ab.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from lanczos_tpu.parallel import mesh as pmesh
from lanczos_tpu.parallel.sharded import ShardedBSROperator


def _marginal(run_k, ks, kl, repeats=7):
    _ = np.asarray(run_k(ks)).ravel()[0]
    _ = np.asarray(run_k(kl)).ravel()[0]
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = np.asarray(run_k(ks)).ravel()[0]; ts = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = np.asarray(run_k(kl)).ravel()[0]; tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (kl - ks))
    return float(np.median(diffs))


def chain_rate(op):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.n_padded).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(o, v, k):
        def body(_, vv):
            y = o.matvec(vv[: o.n])
            return jnp.pad(y, (0, v.shape[0] - y.shape[0]))

        return jax.lax.fori_loop(0, k, body, v)

    t = _marginal(lambda k: chain(op, x, k), 2, 8)
    return 1.0 / t


def main():
    rng = np.random.default_rng(0)
    n = 1 << 18
    i = np.arange(n - 1)
    r = [i, i + 1]
    c = [i + 1, i]
    v = [np.full(n - 1, -1.0)] * 2
    for d, cnt in ((n // 2, 24), (n // 4, 16), (3 * n // 8, 12)):
        pos = rng.choice(n - d, cnt, replace=False)
        w = rng.standard_normal(cnt)
        r += [pos, pos + d]
        c += [pos + d, pos]
        v += [w, w]
    rows = np.concatenate(r); cols = np.concatenate(c); vals = np.concatenate(v)
    m = pmesh.make_mesh()
    out = {"n": n, "cpu_count": os.cpu_count()}

    op_g = ShardedBSROperator.from_coo(rows, cols, vals, n, m, bm=8, bk=8, comm="gather")
    op_f = ShardedBSROperator.from_coo(rows, cols, vals, n, m, bm=8, bk=8, comm="footprint")
    assert op_f.comm == "footprint", op_f.comm
    hop_list = op_f.footprint[1]
    fp_words = sum(s.shape[1] * op_f.bk for (_h, _b, _c, s) in hop_list)
    out["gather_words_per_matvec"] = op_g.n_padded
    out["footprint_words_per_matvec"] = fp_words
    out["comm_volume_ratio"] = round(fp_words / op_g.n_padded, 5)
    out["hops"] = [h for (h, *_x) in hop_list]

    # correctness cross-check before timing
    x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    yg = np.asarray(op_g.matvec(jnp.asarray(x)))
    yf = np.asarray(op_f.matvec(jnp.asarray(x)))
    out["max_abs_diff"] = float(np.abs(yg - yf).max())

    out["rate_gather"] = round(chain_rate(op_g), 1)
    out["rate_footprint"] = round(chain_rate(op_f), 1)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
