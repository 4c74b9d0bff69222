"""Explain the BENCH_r04 8-shard regression (VERDICT r5 item 3).

BENCH_r04 `scaling_cpu_mesh` measured 122.9 / 176.2 / 184.4 / 137.7 (rate
units) at 1 / 2 / 4 / 8 shards of the n=2^15 chain — 8 virtual devices 25%
SLOWER than 4.  Hypotheses:

(a) shard-too-small: at 8 shards each device's local SpMV is ~2^12 rows
    (~microseconds on one core); the per-matvec all_gather's fixed
    synchronization cost (8 threads rendezvous) dominates, and it GROWS
    with device count.  Prediction: the regression disappears at larger n.
(b) collective bandwidth: the gather moves n words to every device;
    prediction: regression persists at every n with the same ratio.
(c) host contention: 8 XLA CPU worker threads oversubscribe the machine;
    prediction: regression tracks core count, not n.

Protocol: matvec chain rate (marginal long-short, CLAUDE.md methodology)
for n in {2^15, 2^18, 2^21} x ndev in {1, 2, 4, 8}, plus a pure-collective
loop (all_gather with no SpMV) at each (n, ndev) to price the fixed cost.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python experiments/cpu_mesh_scaling.py
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

from functools import partial

from jax import shard_map
from jax.sharding import PartitionSpec as P

from lanczos_tpu.ops.operators import BSROperator
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


def gather_rate(n, mesh):
    """Pure all_gather chain (no SpMV): the fixed collective cost."""
    axis = pmesh.ROWS
    ndev = mesh.shape[axis]
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32)),
        pmesh.row_sharding(mesh, 1),
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(v, k):
        @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
        def step(xl):
            full = jax.lax.all_gather(xl, axis, tiled=True)
            # touch every gathered word once so the gather cannot be elided
            s = jnp.sum(full)
            return xl + s * 1e-30

        return jax.lax.fori_loop(0, k, lambda _, vv: step(vv), v)

    t = _marginal(lambda k: chain(x, k), 2, 8)
    return 1.0 / t


def main():
    out = {"cpu_count": os.cpu_count()}
    for logn in (15, 18, 21):
        n = 1 << logn
        i = np.arange(n - 1)
        rows = np.concatenate([i, i + 1]); cols = np.concatenate([i + 1, i])
        vals = np.full(2 * (n - 1), -1.0)
        key = f"n=2^{logn}"
        out[key] = {}
        out[key]["unsharded"] = round(chain_rate(
            BSROperator.from_coo(rows, cols, vals, n, dtype=jnp.float32)), 1)
        for ndev in (1, 2, 4, 8):
            if ndev > len(jax.devices()):
                break
            m = pmesh.make_mesh(jax.devices()[:ndev])
            op = ShardedBSROperator.from_coo(rows, cols, vals, n, m, dtype=jnp.float32)
            r = chain_rate(op)
            g = gather_rate(op.n_padded, m) if ndev > 1 else float("inf")
            out[key][f"sharded_{ndev}"] = round(r, 1)
            out[key][f"gather_only_{ndev}"] = round(g, 1) if np.isfinite(g) else None
            # ring mode where the pattern allows (chain: 1-hop)
            op_r = ShardedBSROperator.from_coo(rows, cols, vals, n, m, dtype=jnp.float32, comm="auto")
            if op_r.comm == "ring" and ndev > 1:
                out[key][f"ring_{ndev}"] = round(chain_rate(op_r), 1)
        print(json.dumps({key: out[key]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
