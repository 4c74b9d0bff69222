"""Headline benchmark: Pallas BSR SpMV throughput vs. the HBM roofline.

The reference publishes no performance numbers (BASELINE.md), so the baseline
is the derived speed-of-light: a BSR matvec must stream every stored nonzero
from HBM once, so nnz/s_max = membw / bytes_per_nnz.  The achievable membw is
*measured* on the same chip with a pure streaming kernel over an equally sized
array (self-calibrating — no hardcoded chip specs), and

    vs_baseline = achieved_spmv_bandwidth / measured_stream_bandwidth

i.e. 1.0 means the sparse matvec runs at the chip's demonstrated memory speed.

Methodology: the K iterations run *inside one jit* as a ``lax.fori_loop``
(single dispatch — per-call/tunnel latency would otherwise dominate), the
sync point is a host transfer of one element, and the per-iteration time is
the *difference* between a long and a short chain, cancelling fixed dispatch
and loop-setup overhead.

Prints exactly one JSON line.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def _marginal_time(run_k, k_short, k_long, *, repeats=5):
    """Per-iteration seconds from the (k_long - k_short) timing difference.

    Median over repeats: robust to one-off dispatch hiccups that can make a
    single difference negative."""
    _ = np.asarray(run_k(k_short).ravel()[0])  # compile both
    _ = np.asarray(run_k(k_long).ravel()[0])
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k_short).ravel()[0])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k_long).ravel()[0])
        t_l = time.perf_counter() - t0
        diffs.append((t_l - t_s) / (k_long - k_short))
    return float(np.median(diffs))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lanczos_tpu.ops.operators import BSROperator

    on_tpu = jax.default_backend() == "tpu"
    bm, bk = 128, 128  # roofline layout (see BSROperator docstring)
    if on_tpu:
        r, s = 512, 8  # 64 Mi nnz -> 256 MiB of f32 tiles
        k_short, k_long = 64, 192
    else:
        r, s = 32, 4  # keep the CPU smoke run quick
        k_short, k_long = 2, 6

    n_pad = r * bm
    rng = np.random.default_rng(0)
    # Scaled so chained iterates neither overflow nor denormalize in f32.
    blocks = jnp.asarray((rng.standard_normal((r, s, bm, bk)) * 0.01).astype(np.float32))
    col_blocks = jnp.asarray(rng.integers(0, n_pad // bk, size=(r, s)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))

    # The operator arrays are jit *arguments* (a closure would bake 256 MiB
    # of tiles into the HLO as a literal — oversized compile payload).
    @functools.partial(jax.jit, static_argnames=("k",))
    def spmv_chain(b, c, v, k):
        op = BSROperator(b, c, n_pad)
        return jax.lax.fori_loop(0, k, lambda _, vv: op.matvec(vv), v)

    t_spmv = _marginal_time(lambda k: spmv_chain(blocks, col_blocks, x, k), k_short, k_long)

    nnz = r * s * bm * bk
    nnz_per_s = nnz / t_spmv
    spmv_bytes = nnz * 4 + n_pad * 4 * 2  # tiles + x read + y write

    # Measured streaming bandwidth on the same array.  The SpMV reads 512x
    # more than it writes, so the fair roofline is a *read* stream: a full
    # reduction whose input is scaled by the carried scalar (the data
    # dependence stops XLA hoisting the sum out of the loop; the multiply
    # fuses into the reduction, so each iteration reads the array once).
    @functools.partial(jax.jit, static_argnames=("k",))
    def stream_chain(b, k):
        return jax.lax.fori_loop(
            0, k, lambda _, acc: jnp.sum(b * (1.0 + acc * 1e-30), dtype=jnp.float32), jnp.float32(0)
        )

    t_stream = _marginal_time(lambda k: stream_chain(blocks, k), k_short, k_long)
    stream_bw = blocks.size * 4 / t_stream  # read-only

    vs_baseline = (spmv_bytes / t_spmv) / stream_bw

    print(
        json.dumps(
            {
                "metric": "bsr_spmv_throughput",
                "value": round(nnz_per_s / 1e9, 3),
                "unit": "Gnnz/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
