"""Pallas fused BCGS pass vs the XLA chunk-loop formulation.

The production ``orthogonalize_bcgs_dyn`` is a ``fori_loop`` over 64-row
chunks; each chunk is a VPU projection reduce + an MXU update matmul.
Measured end-to-end it runs ~640 GB/s against the chip's 845 GB/s read
stream — the sequential dependence between the two ops of each chunk (and
between chunks) leaves pipeline bubbles XLA cannot fill.

This kernel runs the WHOLE pass as one ``pallas_call`` with grid
``(nchunks, 2, n_tiles)`` — phase 0 accumulates the chunk's projection
coefficients over the column tiles, phase 1 applies the update — with
``v`` aliased input/output so later chunks read earlier chunks' updates
(block MGS semantics, same as the fori_loop).  ``nchunks`` is a *dynamic*
grid dimension (Mosaic supports traced grid bounds), so HBM traffic stays
proportional to the live row count k.

Run: python experiments/pallas_bcgs_kernel.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from lanczos_tpu.core import linalg


def make_pass(chunk: int, bn: int):
    def kernel(k_ref, basis_ref, v_ref, out_ref, c_acc):
        ci = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)
        kk = k_ref[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + ci * chunk
        rows = jnp.where(ri < kk, basis_ref[...], 0.0)

        @pl.when(ph == 0)
        def _proj():
            @pl.when(j == 0)
            def _zero():
                c_acc[...] = jnp.zeros_like(c_acc)

            c_acc[...] += jnp.sum(rows * v_ref[...][None, :], axis=1, keepdims=True)
            out_ref[...] = v_ref[...]

        @pl.when(ph == 1)
        def _update():
            c = jnp.where(ri < kk, c_acc[...], 0.0)
            out_ref[...] = (
                v_ref[...]
                - jnp.dot(c.T, rows, preferred_element_type=jnp.float32)[0]
            )

    def one_pass(v, basis, k):
        cap_rows, n = basis.shape
        nchunks = (jnp.asarray(k, jnp.int32) + chunk - 1) // chunk
        grid = (nchunks, 2, n // bn)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((chunk, bn), lambda ci, ph, j, k_ref: (ci, j)),
                    pl.BlockSpec((bn,), lambda ci, ph, j, k_ref: (j,)),
                ],
                out_specs=pl.BlockSpec((bn,), lambda ci, ph, j, k_ref: (j,)),
                scratch_shapes=[pltpu.VMEM((chunk, 1), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            input_output_aliases={2: 0},
        )(jnp.asarray([k], jnp.int32), basis, v)

    return one_pass


def marginal(run_k, ks, kl, repeats=5):
    _ = np.asarray(run_k(ks).ravel()[0])
    _ = np.asarray(run_k(kl).ravel()[0])
    ds = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = np.asarray(run_k(ks).ravel()[0]); a = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = np.asarray(run_k(kl).ravel()[0]); b = time.perf_counter() - t0
        ds.append((b - a) / (kl - ks))
    return float(np.median(ds))


def main():
    n = 1 << 22
    cap = 257
    rng = np.random.default_rng(0)
    basis_np = rng.standard_normal((cap, n)).astype(np.float32)
    basis_np /= np.linalg.norm(basis_np, axis=1, keepdims=True)
    basis = jnp.asarray(basis_np)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # ---- correctness vs the XLA chunk loop --------------------------------
    for chunk, bn in [(64, 2048)]:
        pallas_pass = make_pass(chunk, bn)
        for k in (3, 64, 100, 256):
            ref = linalg.orthogonalize_bcgs_dyn(v, basis, k, passes=1, chunk=chunk)
            got = pallas_pass(v, basis, k)
            err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
            print(f"chunk={chunk} bn={bn} k={k}: rel err vs XLA = {err:.2e}", flush=True)

    # ---- timing: chained passes (marginal method) -------------------------
    # One jit per variant; chain passes with a tiny perturbation so XLA
    # cannot collapse repeated idempotent projections.
    def chain_xla(basis, v, k, reps):
        def body(i, vv):
            return linalg.orthogonalize_bcgs_dyn(vv * (1.0 + 1e-7), basis, k, passes=1)
        return jax.lax.fori_loop(0, reps, body, v)

    for chunk, bn in [(64, 1024), (64, 2048), (64, 4096), (128, 2048), (32, 2048)]:
        pallas_pass = make_pass(chunk, bn)

        def chain_pal(basis, v, k, reps, _p=pallas_pass):
            def body(i, vv):
                return _p(vv * (1.0 + 1e-7), basis, k)
            return jax.lax.fori_loop(0, reps, body, v)

        jc_x = jax.jit(chain_xla, static_argnames=("reps",))
        jc_p = jax.jit(chain_pal, static_argnames=("reps",))
        for k in (64, 128, 256):
            kd = jnp.asarray(k, jnp.int32)
            bytes_pass = 2 * k * n * 4
            t_p = marginal(lambda r: jc_p(basis, v, kd, reps=r), 4, 12)
            line = f"chunk={chunk:3d} bn={bn:4d} k={k:3d}: pallas {t_p*1e3:6.2f} ms ({bytes_pass/t_p/1e9:5.0f} GB/s)"
            if (chunk, bn) == (64, 2048):
                t_x = marginal(lambda r: jc_x(basis, v, kd, reps=r), 4, 12)
                line += f"   xla {t_x*1e3:6.2f} ms ({bytes_pass/t_x/1e9:5.0f} GB/s)"
            print(line, flush=True)


if __name__ == "__main__":
    main()
