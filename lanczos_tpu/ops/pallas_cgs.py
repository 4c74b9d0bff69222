"""Pallas single-drain classical-CGS pass over the live Krylov rows.

The production reorthogonalization (`linalg.orthogonalize_bcgs_dyn`) is a
``fori_loop`` over 64-row chunks; each iteration is a VPU projection reduce
followed by an MXU update matmul, and the loop-carried dependence between
them leaves pipeline bubbles XLA cannot fill — measured ~640-660 GB/s
against the chip's ~845 GB/s read stream at (257, 2^22) f32.

This kernel runs one WHOLE classical Gram-Schmidt pass as a single
``pallas_call`` with grid ``(2, n_tiles, nchunks)``:

* phase 0 accumulates every live chunk's projection coefficients against
  the unmodified ``v`` into a VMEM scratch (and copies ``v`` through to the
  aliased output — every mapped out block is written back when its index
  changes, so skipping the copy clobbers the aliased buffer with stale
  VMEM),
* phase 1 applies the combined update ``v - c @ rows`` tile by tile,
  accumulating chunk contributions in VMEM (``ci`` is the innermost grid
  dimension, so the out block stays resident across chunks).

``nchunks`` is a *dynamic* grid dimension (Mosaic supports traced bounds),
so HBM traffic stays proportional to the live row count ``k``.  The update
dot carries ``precision=HIGHEST``: the TPU's default f32 matmul uses bf16
passes, and coefficients applied at bf16 would leave ~1e-3 residual
overlap, breaking the omega/selective reorthogonalization machinery.

Measured (v5e, cap=257, n=2^22, f32, marginal chained-jit method;
experiments/pallas_bcgs_kernel2.py): 2.25 / 5.70 / 11.80 ms per pass at
k=64/128/256 with chunk=64, bn=4096 — 954/754/728 GB/s on the 2kn-byte
accounting vs the fori_loop's 655/639/664.

Semantics note: one kernel pass is CLASSICAL GS over rows [0, k) (all
coefficients measured against the incoming ``v``), whereas the fori_loop
formulation is block-MGS (later chunks project the already-updated ``v``).
For the orthonormal-basis contract the two differ by O(eps * |c|) cross
terms — the same order as the polish pass any CGS2 caller adds.  This is
exactly the classical pass the reference's ``schmidt_orth``
(util/linear_algebra.hpp:132-144) computes per sweep.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_cgs_fits", "cgs_pass", "cgs_pass_block"]

_CHUNK = 64
# Tile widths tried in descending preference; 4096 measured best overall
# (954 GB/s at k=64); anything down to 512 stays within a few percent.
_BN_CANDIDATES = (4096, 2048, 1024, 512)


def pallas_cgs_fits(basis, v) -> bool:
    """True when the Pallas pass applies: real f32 data on a TPU backend,
    a tile width dividing n, and a basis tall enough to amortize setup."""
    if os.environ.get("LANCZOS_TPU_NO_PALLAS_CGS"):  # A/B escape hatch
        return False
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() > 1:
        # Sharded solves run these reductions under GSPMD; an opaque custom
        # call would force XLA to gather the row-sharded basis onto every
        # device.  Multi-chip keeps the fori-loop form (partial reductions
        # + psum via sharding propagation).
        return False
    if basis.dtype != jnp.float32 or v.dtype != jnp.float32:
        return False
    cap, n = basis.shape
    if cap < _CHUNK:  # single partial chunk: the fori_loop does one cheap step
        return False
    return any(n % bn == 0 for bn in _BN_CANDIDATES)


def _kernel(chunk, bn, precision, k_ref, basis_ref, v_ref, out_ref, c_acc):
    ph = pl.program_id(0)
    j = pl.program_id(1)
    ci = pl.program_id(2)
    kk = k_ref[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + ci * chunk
    rows = jnp.where(ri < kk, basis_ref[...], 0.0)

    @pl.when(ph == 0)
    def _proj():
        @pl.when(j == 0)
        def _zero_row():
            c_acc[pl.ds(ci * chunk, chunk), :] = jnp.zeros((chunk, 1), jnp.float32)

        cur = c_acc[pl.ds(ci * chunk, chunk), :]
        c_acc[pl.ds(ci * chunk, chunk), :] = cur + jnp.sum(
            rows * v_ref[...][None, :], axis=1, keepdims=True
        )
        # v is aliased to out: preserve it through phase 0's block write-backs.
        out_ref[...] = v_ref[...]

    @pl.when(ph == 1)
    def _update():
        c = c_acc[pl.ds(ci * chunk, chunk), :]  # (chunk, 1)
        upd = jax.lax.dot_general(
            c.T, rows, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )[0]

        @pl.when(ci == 0)
        def _init():
            out_ref[...] = v_ref[...] - upd

        @pl.when(ci != 0)
        def _acc():
            out_ref[...] = out_ref[...] - upd


def _kernel_block(chunk, bn, precision, k_ref, basis_ref, v_ref, out_ref, c_acc):
    """Block-RHS variant: the projection/update tiles carry all b block rows
    at once, so the basis stream (the dominant HBM traffic) is read ONCE for
    the whole block instead of once per vector."""
    ph = pl.program_id(0)
    j = pl.program_id(1)
    ci = pl.program_id(2)
    kk = k_ref[0]
    b = v_ref.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + ci * chunk
    rows = jnp.where(ri < kk, basis_ref[...], 0.0)

    @pl.when(ph == 0)
    def _proj():
        @pl.when(j == 0)
        def _zero_row():
            c_acc[pl.ds(ci * chunk, chunk), :] = jnp.zeros((chunk, b), jnp.float32)

        cur = c_acc[pl.ds(ci * chunk, chunk), :]
        c_acc[pl.ds(ci * chunk, chunk), :] = cur + jax.lax.dot_general(
            rows, v_ref[...], (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        # v is aliased to out: preserve it through phase 0's block write-backs.
        out_ref[...] = v_ref[...]

    @pl.when(ph == 1)
    def _update():
        c = c_acc[pl.ds(ci * chunk, chunk), :]  # (chunk, b)
        upd = jax.lax.dot_general(
            c, rows, (((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )  # (b, bn)

        @pl.when(ci == 0)
        def _init():
            out_ref[...] = v_ref[...] - upd

        @pl.when(ci != 0)
        def _acc():
            out_ref[...] = out_ref[...] - upd


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def cgs_pass_block(vblk, basis, k, chunk: int = _CHUNK, interpret: bool = False):
    """One classical GS pass of the (b, n) block ``vblk`` against rows
    [0, k) of ``basis`` — the block form of :func:`cgs_pass` (same grid,
    masking, and aliasing discipline; per-vector HBM traffic drops ~b-fold
    because the basis stream is shared).  Caller must have checked
    :func:`pallas_cgs_fits` (on ``basis`` and one block row)."""
    cap_rows, n = basis.shape
    b = vblk.shape[0]
    bn = next((w for w in _BN_CANDIDATES if n % w == 0), None)
    if bn is None and interpret and n % 128 == 0:
        bn = 128  # interpreter tests use small n
    assert bn is not None, "caller must check pallas_cgs_fits"
    cap_chunks = (cap_rows + chunk - 1) // chunk
    nchunks = (jnp.asarray(k, jnp.int32) + chunk - 1) // chunk
    kernel = functools.partial(_kernel_block, chunk, bn, jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2, n // bn, nchunks),
            in_specs=[
                pl.BlockSpec((chunk, bn), lambda ph, j, ci, k_ref: (ci, j)),
                pl.BlockSpec((b, bn), lambda ph, j, ci, k_ref: (0, j)),
            ],
            out_specs=pl.BlockSpec((b, bn), lambda ph, j, ci, k_ref: (0, j)),
            scratch_shapes=[pltpu.VMEM((cap_chunks * chunk, b), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(k, jnp.int32), (1,)), basis, vblk)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def cgs_pass(v, basis, k, chunk: int = _CHUNK, interpret: bool = False):
    """One classical GS pass of ``v`` against rows [0, k) of ``basis``.

    ``k`` is a traced scalar; the compiled program serves every live count.
    Caller must have checked :func:`pallas_cgs_fits`.  ``interpret=True``
    runs the kernel through the Pallas interpreter (CPU tests cover the
    masking / aliasing / ragged-edge logic without a chip).
    """
    cap_rows, n = basis.shape
    bn = next((b for b in _BN_CANDIDATES if n % b == 0), None)
    if bn is None and interpret and n % 128 == 0:
        bn = 128  # interpreter tests use small n
    assert bn is not None, "caller must check pallas_cgs_fits"
    cap_chunks = (cap_rows + chunk - 1) // chunk
    nchunks = (jnp.asarray(k, jnp.int32) + chunk - 1) // chunk
    kernel = functools.partial(_kernel, chunk, bn, jax.lax.Precision.HIGHEST)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2, n // bn, nchunks),
            in_specs=[
                pl.BlockSpec((chunk, bn), lambda ph, j, ci, k_ref: (ci, j)),
                pl.BlockSpec((bn,), lambda ph, j, ci, k_ref: (j,)),
            ],
            out_specs=pl.BlockSpec((bn,), lambda ph, j, ci, k_ref: (j,)),
            scratch_shapes=[pltpu.VMEM((cap_chunks * chunk, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(k, jnp.int32), (1,)), basis, v)
