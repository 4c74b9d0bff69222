"""Candidate Pallas BSR SpMV kernels vs the XLA gather+einsum path
(VERDICT round-1 item 3: make the hand kernel win or demote it).

Variants on the 64Mi-nnz roofline operator (r=512, s=8, 128x128 f32 tiles):
  einsum  XLA gather+einsum at precision=HIGHEST (the current default)
  v1      round-1 kernel: one row-block slab per grid step (measured 513 GB/s)
  v2      G=8 row-blocks per step (4 MB slabs), 2-level fori, per-tile dots
  v3      pre-transposed (R, bm, S, bk) layout: one (bm, S*bk) x (S*bk,)
          MXU dot per row block (long contraction, no in-kernel transpose)
  v2vpu   like v2 but VPU multiply-reduce instead of MXU dots

Run on the real chip: python experiments/pallas_spmv_bench.py
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

from lanczos_tpu.ops import pallas_spmv

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


# ---- v2: G row blocks per step, per-tile dots ------------------------------

def _kernel_v2(cb_ref, blk_ref, x_ref, y_ref, *, G, s_total, bm, vpu):
    i = pl.program_id(0)

    def body_g(g, _):
        def body_s(si, acc):
            cb = cb_ref[(i * G + g) * s_total + si]
            xseg = x_ref[cb, :]
            if vpu:
                return acc + jnp.sum(blk_ref[g, si] * xseg[None, :], axis=1)
            return acc + jnp.dot(blk_ref[g, si], xseg, preferred_element_type=jnp.float32, precision=HI)

        acc = jax.lax.fori_loop(0, s_total, body_s, jnp.zeros((bm,), jnp.float32))
        y_ref[g, :] = acc
        return 0

    jax.lax.fori_loop(0, G, body_g, 0)


def spmv_v2(blocks, col_blocks, x, G=8, vpu=False):
    r, s, bm, bk = blocks.shape
    x2 = x.reshape(-1, bk)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, G=G, s_total=s, bm=bm, vpu=vpu),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // G,),
            in_specs=[
                pl.BlockSpec((G, s, bm, bk), lambda i, cb: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, bm), lambda i, cb: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, bm), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * s * bm * bk,
            bytes_accessed=blocks.size * 4 + x2.size * 4 + r * bm * 4,
            transcendentals=0,
        ),
    )(col_blocks.reshape(-1), blocks, x2)
    return out.reshape(-1)


# ---- v3: pre-transposed (R, bm, S, bk), one long dot per row block ---------

def _kernel_v3(cb_ref, blk_ref, x_ref, y_ref, xg_ref, *, G, s_total, bm, bk):
    i = pl.program_id(0)

    def body_g(g, _):
        def gather(si, _c):
            cb = cb_ref[(i * G + g) * s_total + si]
            xg_ref[si, :] = x_ref[cb, :]
            return 0

        jax.lax.fori_loop(0, s_total, gather, 0)
        flat = xg_ref[...].reshape(s_total * bk)
        y_ref[g, :] = jnp.dot(
            blk_ref[g].reshape(bm, s_total * bk), flat,
            preferred_element_type=jnp.float32, precision=HI,
        )
        return 0

    jax.lax.fori_loop(0, G, body_g, 0)


def spmv_v3(blocks_t, col_blocks, x, G=8):
    r, bm, s, bk = blocks_t.shape
    x2 = x.reshape(-1, bk)
    out = pl.pallas_call(
        functools.partial(_kernel_v3, G=G, s_total=s, bm=bm, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // G,),
            in_specs=[
                pl.BlockSpec((G, bm, s, bk), lambda i, cb: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, bm), lambda i, cb: (i, 0)),
            scratch_shapes=[pltpu.VMEM((s, bk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, bm), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * s * bm * bk,
            bytes_accessed=blocks_t.size * 4 + x2.size * 4 + r * bm * 4,
            transcendentals=0,
        ),
    )(col_blocks.reshape(-1), blocks_t, x2)
    return out.reshape(-1)


def main():
    bm = bk = 128
    r, s = 512, 8
    n_pad = r * bm
    rng = np.random.default_rng(0)
    blocks = jnp.asarray((rng.standard_normal((r, s, bm, bk)) * 0.01).astype(np.float32))
    blocks_t = jnp.asarray(np.moveaxis(np.asarray(blocks), 2, 1).copy())  # (R, bm, S, bk)
    cb = jnp.asarray(rng.integers(0, n_pad // bk, size=(r, s)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    nnz = r * s * bm * bk

    ref = np.asarray(pallas_spmv.bsr_matvec_reference(blocks, cb, x))

    # NB: the tile arrays must be jit ARGUMENTS — a closure bakes 256 MB
    # into the HLO and blows the remote-compile request (HTTP 413).
    variants = {
        "einsum": (blocks, lambda b, c, v: pallas_spmv.bsr_matvec_reference(b, c, v)),
        "v1": (blocks, lambda b, c, v: pallas_spmv.bsr_matvec_pallas(b, c, v)),
        "v2": (blocks, lambda b, c, v: spmv_v2(b, c, v, G=8)),
        "v2vpu": (blocks, lambda b, c, v: spmv_v2(b, c, v, G=8, vpu=True)),
        "v3": (blocks_t, lambda b, c, v: spmv_v3(b, c, v, G=8)),
    }
    out = {"backend": jax.default_backend()}
    for name, (barr, fn) in variants.items():
        try:
            got = np.asarray(jax.jit(fn)(barr, cb, x))
            err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(b, c, v, k, _fn=fn):
                return jax.lax.fori_loop(0, k, lambda _, vv: _fn(b, c, vv) * 0.01, v)

            t = marginal(lambda k: chain(barr, cb, x, k), 64, 192)
            out[name] = {
                "gnnz_per_s": round(nnz / t / 1e9, 1),
                "gb_per_s": round(nnz * 4 / t / 1e9, 1),
                "rel_err": err,
            }
        except Exception as e:  # noqa: BLE001
            out[name] = "ERR: " + repr(e)[:200]
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
