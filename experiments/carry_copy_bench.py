"""Measure the per-iteration cost of updating one row of a large Krylov
buffer carried through a ``lax.while_loop`` — the round-2 design experiment
for killing the fused engine's carry-copy tax (VERDICT item 2).

Variants:
  A  single (cap+1, n) buffer, dynamic_update_slice  (round-1 layout)
  C  K chunks carried as a tuple, lax.switch selects which chunk's DUS runs
  G  single buffer, Pallas row-write with input_output_aliases (true in-place)

Each variant is timed with the marginal method (long - short trip count of
the SAME compiled while_loop, iteration count as a traced operand), with a
host-transfer sync.  Optionally adds a CGS-like full-basis matmul read to
model a real iteration.

Run on the real chip:  python experiments/carry_copy_bench.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# --- variant G: pallas in-place row write ---------------------------------

def _row_write_kernel(k_ref, buf_ref, w_ref, out_ref):
    del k_ref, buf_ref  # buf is aliased to out and never transferred
    out_ref[...] = w_ref[...]


def row_set_pallas(buf, k, w):
    # Mosaic wants the last two block dims (8, 128)-divisible or full-size:
    # view the (cap1, n) buffer as (cap1, n//128, 128) and write one
    # (1, n//128, 128) row block in place via input_output_aliases.
    cap1, n = buf.shape
    b3 = buf.reshape(cap1, n // 128, 128)
    out = pl.pallas_call(
        _row_write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, n // 128, 128), lambda i, kref: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n // 128, 128), lambda i, kref: (kref[0], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((cap1, n // 128, 128), buf.dtype),
        input_output_aliases={1: 0},
    )(jnp.reshape(k, (1,)).astype(jnp.int32), b3, w.reshape(1, n // 128, 128))
    return out.reshape(cap1, n)


# --- bodies ----------------------------------------------------------------

def run_variant(name, cap1, n, K=8, cgs=False):
    rows = cap1 // K
    assert rows * K == cap1

    def read_row_single(buf, k):
        return jax.lax.dynamic_index_in_dim(buf, k, 0, keepdims=False)

    def read_row_chunked(chunks, k):
        cid, loc = k // rows, k % rows
        return jax.lax.switch(
            cid, [lambda loc=loc, c=c: jax.lax.dynamic_index_in_dim(c, loc, 0, keepdims=False) for c in chunks]
        )

    def set_row_chunked(chunks, k, w):
        cid, loc = k // rows, k % rows

        def make_branch(i):
            def branch():
                return tuple(
                    jax.lax.dynamic_update_slice_in_dim(c, w[None], loc, 0) if j == i else c
                    for j, c in enumerate(chunks)
                )
            return branch

        return jax.lax.switch(cid, [make_branch(i) for i in range(K)])

    def cgs_term(read_all, w):
        # one (cap1, n) @ (n,) + (cap1,) @ (cap1, n): models the reorth reads
        c = read_all @ w
        return w - c @ read_all

    @jax.jit
    def loop(state0, kmax):
        def cond(st):
            return st[-1] < kmax

        def body(st):
            if name == "A":
                buf, k = st
                u = read_row_single(buf, k - 1)
                w = u * 0.999 + 1e-9
                if cgs:
                    w = cgs_term(buf, w)
                buf = jax.lax.dynamic_update_slice_in_dim(buf, w[None], k % cap1, 0)
                return (buf, k + 1)
            if name == "C":
                *chunks, k = st
                chunks = tuple(chunks)
                u = read_row_chunked(chunks, k - 1)
                w = u * 0.999 + 1e-9
                if cgs:
                    w = cgs_term(jnp.concatenate(chunks), w)
                chunks = set_row_chunked(chunks, k % cap1, w)
                return (*chunks, k + 1)
            if name == "G":
                buf, k = st
                u = read_row_single(buf, k - 1)
                w = u * 0.999 + 1e-9
                if cgs:
                    w = cgs_term(buf, w)
                buf = row_set_pallas(buf, k % cap1, w)
                return (buf, k + 1)
            if name == "H":  # carry the buffer, read a row, never write it
                buf, k = st
                u = read_row_single(buf, k - 1)
                _ = u  # row read only
                return (buf, k + 1)
            if name == "I":  # carry the buffer untouched entirely
                buf, k = st
                return (buf, k + 1)
            raise ValueError(name)

        return jax.lax.while_loop(cond, body, state0)

    rng = np.random.default_rng(0)
    if name in ("A", "G", "H", "I"):
        buf = jnp.asarray(rng.standard_normal((cap1, n)).astype(np.float32))
        state0 = (buf, jnp.asarray(1, jnp.int32))
        out_index = 0
    else:
        chunks = tuple(
            jnp.asarray(rng.standard_normal((rows, n)).astype(np.float32)) for _ in range(K)
        )
        state0 = (*chunks, jnp.asarray(1, jnp.int32))
        out_index = 0

    def run_k(k):
        out = loop(state0, jnp.asarray(k, jnp.int32))
        return out[out_index]

    t = marginal(run_k, 40, 200)
    return round(t * 1e6, 1)


def main():
    import os
    only = os.environ.get("CARRY_VARIANTS", "ACG")
    out = {"backend": jax.default_backend()}
    cap1 = 256
    for n in (1 << 18, 1 << 20):
        for cgs in (False, True):
            for name in ("A", "C", "G", "H", "I"):
                if name not in only:
                    continue
                key = f"{name}_n{n}_cgs{int(cgs)}"
                try:
                    out[key] = run_variant(name, cap1, n, K=8, cgs=cgs)
                except Exception as e:  # noqa: BLE001
                    out[key] = "ERR: " + repr(e)[:200]
                print(key, out[key], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
