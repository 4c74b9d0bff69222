"""Pallas TPU kernel for the BSR sparse matvec (the framework's hot op).

The reference's entire compute cost concentrates in the user ``mv_mul``
closure (reference: include/lambda_lanczos/lambda_lanczos.hpp:243 is the hot
call site; O(nnz) per Lanczos iteration).  On TPU the equivalent
speed-of-light operation is streaming dense (bm x bk) tiles of nonzeros from
HBM at full bandwidth while the input-vector segments are gathered from VMEM
by block-column index — scalar-prefetched so the pipeline can schedule the
tile DMAs ahead of compute.

Layouts (see :class:`lanczos_tpu.ops.operators.BSROperator`):
  blocks      "rsmk" (R, S, bm, bk) canonical; "rmsk" (R, bm, S, bk) the
              production pre-transposed storage (one long MXU contraction
              per row block).  Padding tiles are all-zero.
  col_blocks  (R, S) int32    block-column of each tile (padding -> 0)
  x           (n_pad,)        n_pad = R * bm = C * bk

Roofline: the kernel reads ``R*S*bm*bk`` values once; with f32 tiles that is
4 bytes/nnz, so nnz/s_max = HBM_BW / 4 (about 2e11 nnz/s on a v5e's
~820 GB/s).  ``bench.py`` measures against exactly this roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec_pallas", "bsr_matvec_pallas_t", "bsr_matvec_reference"]

# VMEM working-set budget for the Pallas path (bytes).  The input vector
# lives fully in VMEM (segments are random-access by block-column index),
# plus the double-buffered tile slab and the gather scratch; past this the
# kernel cannot be placed and the caller must take the XLA einsum path.
VMEM_BUDGET = 12 * 1024 * 1024


def bsr_matvec_reference(blocks, col_blocks, x, layout="rsmk"):
    """Portable jnp implementation (identical numerics, any backend/dtype).

    precision=HIGHEST is mandatory: on TPU the DEFAULT f32 einsum runs bf16
    MXU passes — measured 8e-3 relative matvec error on a unit chain, which
    poisons eigenvalues at 1e-3 (CPU tests cannot catch this).  The op is
    HBM-bandwidth-bound, so the extra MXU passes are free.

    ``layout`` names the axis order of ``blocks``: "rsmk" (canonical) or
    "rmsk" (the Pallas-optimized pre-transposed storage).
    """
    if layout == "rmsk":
        r, bm, s, bk = blocks.shape
        spec = "rmsk,rsk->rm"
    else:
        r, s, bm, bk = blocks.shape
        spec = "rsmk,rsk->rm"
    x2 = x.reshape(-1, bk)
    xg = x2[col_blocks]  # (R, S, bk) gather of needed segments
    acc = jnp.promote_types(blocks.dtype, jnp.float32)
    y = jnp.einsum(
        spec, blocks, xg, preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(-1).astype(x.dtype)


def _spmv_kernel(cb_ref, blk_ref, x_ref, y_ref, *, out_dtype):
    i = pl.program_id(0)
    s_total = blk_ref.shape[1]
    bm = blk_ref.shape[2]

    def body(s, acc):
        # cb_ref is the *flattened* (R*S,) col_blocks: SMEM pads the trailing
        # dim to 128 lanes, so a 2D (R, S) layout would blow the ~1 MiB SMEM
        # budget at S << 128 (observed: 4 MiB for R=8192, S=8).
        cb = cb_ref[i * s_total + s]
        xseg = x_ref[cb, :]  # (bk,) segment selected by block-column index
        return acc + jnp.dot(
            blk_ref[0, s], xseg, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, s_total, body, jnp.zeros((bm,), jnp.float32))
    y_ref[0, 0, :] = acc.astype(out_dtype)


def _bsr_pallas_call(blocks, col_blocks, x2, *, interpret=False):
    r, s, bm, bk = blocks.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # col_blocks lands in SMEM before the body runs
        grid=(r,),
        in_specs=[
            # One row-block slab of tiles per grid step; Pallas double-buffers
            # the HBM->VMEM stream of these slabs across steps.
            pl.BlockSpec((1, s, bm, bk), lambda i, cb: (i, 0, 0, 0)),
            # The input vector stays fully in VMEM (segments are random-access).
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        # Output is (r, 1, bm) so the trailing block dims equal the array dims
        # (Mosaic's tiling rule); squeezed back to a vector by the caller.
        out_specs=pl.BlockSpec((1, 1, bm), lambda i, cb: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_spmv_kernel, out_dtype=x2.dtype),
        out_shape=jax.ShapeDtypeStruct((r, 1, bm), x2.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * r * s * bm * bk,
            bytes_accessed=blocks.size * blocks.dtype.itemsize + x2.nbytes + r * bm * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(col_blocks.reshape(-1), blocks, x2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec_pallas(blocks, col_blocks, x, interpret=False):
    """Round-1 BSR matvec kernel (one row-block slab, per-tile dots).

    Kept as the interpret-mode reference for the ``rsmk`` layout; the
    production TPU kernel is :func:`bsr_matvec_pallas_t` (measured ~740 vs
    ~500 GB/s — the per-tile inner dots here leave the MXU pipeline
    underfed).  Falls back to the jnp path for complex dtypes."""
    if jnp.issubdtype(blocks.dtype, jnp.complexfloating):
        return bsr_matvec_reference(blocks, col_blocks, x)

    r, s, bm, bk = blocks.shape
    n_pad = x.shape[0]
    x2 = x.reshape(n_pad // bk, bk)
    y2 = _bsr_pallas_call(blocks, col_blocks, x2, interpret=interpret)
    return y2.reshape(-1)


# ---------------------------------------------------------------------------
# Production kernel: pre-transposed (R, bm, S, bk) layout, G row blocks per
# grid step, ONE long (bm, S*bk) x (S*bk,) MXU contraction per row block.
# The long contraction keeps the systolic array fed (vs. S short per-tile
# dots), and the layout transpose is done once at pack time, not per matvec.
# Measured on a v5e 64Mi-nnz operator: 184.9 Gnnz/s / 739.6 GB/s vs the XLA
# gather+einsum path's 180.1 / 720.3 (experiments/pallas_spmv_bench.py) —
# this is the kernel that finally beats XLA at its own pipelining game.
# ---------------------------------------------------------------------------


def _spmv_kernel_t(cb_ref, blk_ref, x_ref, y_ref, xg_ref, *, G, s_total, bm, bk, out_dtype):
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
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        ).astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, G, body_g, 0)


def _pick_g(r: int) -> int:
    """Largest divisor of r in {8, 4, 2, 1} — the grid must tile r exactly."""
    for g in (8, 4, 2, 1):
        if r % g == 0:
            return g
    return 1


def pallas_t_fits(r: int, s: int, bm: int, bk: int, n_pad: int, itemsize: int = 4) -> bool:
    """Whether the transposed-layout kernel's VMEM working set fits on-chip."""
    g = _pick_g(r)
    slab = 2 * g * s * bm * bk * itemsize  # double-buffered tile stream
    return n_pad * itemsize + slab + s * bk * itemsize <= VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec_pallas_t(blocks_t, col_blocks, x, interpret=False):
    """BSR matvec for the pre-transposed ``rmsk`` layout.

    ``blocks_t`` is (R, bm, S, bk): each row block's tiles are stored
    row-major within the block so the kernel contracts (bm, S*bk) x (S*bk,)
    in one MXU dot after gathering the S input segments into scratch.
    Complex dtypes fall back to the jnp path (layout-aware einsum)."""
    if jnp.issubdtype(blocks_t.dtype, jnp.complexfloating):
        return bsr_matvec_reference(blocks_t, col_blocks, x, layout="rmsk")

    r, bm, s, bk = blocks_t.shape
    g = _pick_g(r)
    x2 = x.reshape(-1, bk)
    out = pl.pallas_call(
        functools.partial(_spmv_kernel_t, G=g, s_total=s, bm=bm, bk=bk, out_dtype=x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // g,),
            in_specs=[
                pl.BlockSpec((g, bm, s, bk), lambda i, cb: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, bm), lambda i, cb: (i, 0)),
            scratch_shapes=[pltpu.VMEM((s, bk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, bm), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * s * bm * bk,
            bytes_accessed=blocks_t.size * blocks_t.dtype.itemsize + x2.nbytes + r * bm * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(col_blocks.reshape(-1), blocks_t, x2)
    return out.reshape(-1)
