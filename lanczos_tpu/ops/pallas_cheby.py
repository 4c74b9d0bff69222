"""Time-tiled Pallas kernel for the Chebyshev filter's matvec chain.

The filtered flagship's cost is ~all in the degree-long three-term recurrence

    t_{k+1} = (2/e)(A - c) t_k - t_{k-1}

executed as a ``lax.scan`` of DIA matvecs: every step streams the iterates
and the diagonal data from HBM (~5 vectors of traffic/step), so a degree-400
filter application at n=4.2M runs at the HBM stream rate (~26 ms — 16.9 s
flagship, BASELINE.md).  XLA cannot fuse ACROSS recurrence steps (each step
is a full-array data dependence), but the stencil structure can: this kernel
keeps a segment of the iterates resident in VMEM and advances it ``s`` steps
per HBM round trip — the classical overlapped (trapezoidal) time-tiling.

Scheme
------
* The operator is pre-scaled once per apply: ``data' = (2/e)·data`` with
  ``-2c/e`` folded into the 0-offset diagonal, so the in-kernel step is the
  scalar-free ``t_next = Σ_d data'_d ⊙ roll(t, -off_d) − t_{k-1}``.
* Arrays are zero-padded by ``H ≥ s·w`` (w = bandwidth) on both ends; zero
  pads reproduce the matrix-edge semantics exactly (data' is zero there, so
  pad cells stay zero through every step).
* Grid over segments of core length L: each program DMAs ``[i·L, i·L+L+2H)``
  of t, t_prev and data' into VMEM (overlapping halo reads), runs the
  ``s``-step recurrence on the full window — the ends go progressively
  stale at ≤ w cells/step, i.e. the garbage cone never reaches deeper than
  ``s·w ≤ H`` — and writes back only the still-exact interior L.
  ``pltpu.roll`` wrap-around contaminates only the cone, so no edge masks
  are needed.
* Between kernel calls the core outputs are re-padded (zeros) and the
  remainder steps (degree-1 mod s) run on the plain jnp path.

Traffic: (4 + ndiag)·n words per s steps vs ~5·n per step unfused — a ~s·
(5/7)-fold HBM reduction (s=128 default); the chain becomes VPU-bound.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cheby_chain_fits", "cheby_chain_apply"]

_LANE = 1024  # keep every 1D extent a multiple of 8*128 (f32 tile)
_L_CORE = 1 << 18  # 1 MiB f32 segment core
_S_STEPS = 128  # recurrence steps per HBM round trip


def _plan(n: int, w: int, s: int):
    h = -(-max(s * w, 1) // _LANE) * _LANE  # halo, rounded to a full tile
    l = _L_CORE
    ncore = -(-max(n, 1) // l) * l
    if ncore // l == 1 and ncore > n:  # small problems: single tight segment
        l = -(-n // _LANE) * _LANE
        ncore = l
    return l, h, ncore


def cheby_chain_fits(ndiag: int, w: int, *, s: int = _S_STEPS, itemsize: int = 4) -> bool:
    """VMEM budget check: scratch (2 + ndiag) windows of L+2H words plus
    ~4 loop temporaries must fit in ~14 MiB."""
    l, h, _ = _plan(_L_CORE, w, s)
    m = l + 2 * h
    return (2 + ndiag + 4) * m * itemsize <= 14 * (1 << 20)


def _shift2d(t, s, lane):
    """out[flat j] = t[flat j + s] for a (R, 128) row-major view, |s| < 128.

    Mosaic has no 1D rotate (``tpu.dynamic_rotate`` rejects 1D shapes), so
    the flat element shift decomposes into a lane roll plus a one-row
    sublane roll patched in at the wrapped lanes — together they ARE the
    flat circular rotation, so the wrap-garbage analysis of the 1D design
    carries over unchanged."""
    r = t.shape[0]
    if s == 0:
        return t
    if s > 0:
        rolled = pltpu.roll(t, 128 - s, 1)  # lanes left by s
        carry = pltpu.roll(rolled, r - 1, 0)  # rows up by 1
        return jnp.where(lane < 128 - s, rolled, carry)
    s2 = -s
    rolled = pltpu.roll(t, s2, 1)  # lanes right by s2
    carry = pltpu.roll(rolled, 1, 0)  # rows down by 1
    return jnp.where(lane >= s2, rolled, carry)


def _cheby_kernel(t_ref, tm1_ref, data_ref, out_t_ref, out_tm1_ref,
                  t_s, tm1_s, data_s, sems, *, LR, HR, MR, steps, offsets):
    # row units: LR = L/128 core rows, HR = H/128 halo rows, MR = LR + 2*HR
    i = pl.program_id(0)
    cp_t = pltpu.make_async_copy(t_ref.at[pl.ds(i * LR, MR), :], t_s, sems.at[0])
    cp_m = pltpu.make_async_copy(tm1_ref.at[pl.ds(i * LR, MR), :], tm1_s, sems.at[1])
    cp_d = pltpu.make_async_copy(data_ref.at[:, pl.ds(i * LR, MR), :], data_s, sems.at[2])
    cp_t.start()
    cp_m.start()
    cp_d.start()
    cp_t.wait()
    cp_m.wait()
    cp_d.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (MR, 128), 1)

    def step(_, carry):
        t, tm1 = carry
        acc = None
        for d, off in enumerate(offsets):
            term = data_s[d] * _shift2d(t, off, lane)
            acc = term if acc is None else acc + term
        return (acc - tm1, t)

    t_fin, tm1_fin = jax.lax.fori_loop(0, steps, step, (t_s[:], tm1_s[:]))
    out_t_ref[:] = jax.lax.slice(t_fin, (HR, 0), (HR + LR, 128))
    out_tm1_ref[:] = jax.lax.slice(tm1_fin, (HR, 0), (HR + LR, 128))


@functools.partial(
    jax.jit, static_argnames=("offsets", "degree", "s", "interpret")
)
def cheby_chain_apply(data, offsets, x, c, e, degree: int, *, s: int = _S_STEPS, interpret: bool = False):
    """T_degree((A - c)/e) @ x for the DIA operator (offsets, data).

    ``offsets`` is a static tuple of small ints, ``data`` is (ndiag, n) with
    ``data[d, i] = A[i, i + offsets[d]]``; c, e are traced scalars.  Pure
    function of its inputs — the caller (ChebyshevFilterOperator.matvec)
    guards backend/dtype/bandwidth via :func:`cheby_chain_fits`.
    """
    if degree < 1:
        # T_0 = identity; silently running the remainder loop on degree=0
        # would return T_{s-1}-flavored garbage (divmod(-1, s) = (-1, s-1))
        raise ValueError(f"degree must be >= 1, got {degree} (T_0 is the identity)")
    n = x.shape[0]
    dt = x.dtype
    w = max((abs(int(o)) for o in offsets), default=0)

    # prescale: data' = (2/e) data, with -2c/e on the 0-offset diagonal
    offs = tuple(int(o) for o in offsets)
    scale = (2.0 / e).astype(dt)
    shift = (-2.0 * c / e).astype(dt)
    if 0 in offs:
        z = offs.index(0)
        data_p = data * scale
        data_p = data_p.at[z].add(shift)
    else:
        offs = offs + (0,)
        data_p = jnp.concatenate([data * scale, jnp.broadcast_to(shift, (1, n)).astype(dt)])

    # t1 = (1/e)(A - c) x = 0.5 * (data' applied to x)
    def dia_step(t, tm1):
        acc = None
        for d, off in enumerate(offs):
            xo = jnp.roll(t, -off)
            if off > 0:
                xo = xo.at[-off:].set(0)
            elif off < 0:
                xo = xo.at[:-off].set(0)
            term = data_p[d] * xo
            acc = term if acc is None else acc + term
        return acc - tm1

    t1 = 0.5 * dia_step(x, jnp.zeros_like(x))
    if degree == 1:
        return t1

    l, h, ncore = _plan(n, w, s)
    m = l + 2 * h
    nseg = ncore // l
    g = ncore + 2 * h
    lr, hr, mr, gr, ncr = l // 128, h // 128, m // 128, g // 128, ncore // 128
    total = degree - 1
    nsuper, rem = divmod(total, s)

    def pad(core2d):
        return jnp.zeros((gr, 128), dt).at[hr : hr + ncr].set(core2d)

    t_core = jnp.zeros((ncore,), dt).at[:n].set(t1).reshape(ncr, 128)
    tm1_core = jnp.zeros((ncore,), dt).at[:n].set(x).reshape(ncr, 128)
    data_g = (
        jnp.zeros((data_p.shape[0], g), dt)
        .at[:, h : h + n]
        .set(data_p)
        .reshape(data_p.shape[0], gr, 128)
    )

    kern = functools.partial(_cheby_kernel, LR=lr, HR=hr, MR=mr, steps=s, offsets=offs)
    call = pl.pallas_call(
        kern,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((lr, 128), lambda i: (i, 0)),
            pl.BlockSpec((lr, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ncr, 128), dt),
            jax.ShapeDtypeStruct((ncr, 128), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((mr, 128), dt),
            pltpu.VMEM((mr, 128), dt),
            pltpu.VMEM((data_p.shape[0], mr, 128), dt),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    if nsuper > 0:

        def super_step(carry, _):
            t_core, tm1_core = carry
            t_new, tm1_new = call(pad(t_core), pad(tm1_core), data_g)
            return (t_new, tm1_new), None

        (t_core, tm1_core), _ = jax.lax.scan(
            super_step, (t_core, tm1_core), None, length=nsuper
        )

    t = t_core.reshape(-1)[:n]
    tm1 = tm1_core.reshape(-1)[:n]
    for _ in range(rem):
        t, tm1 = dia_step(t, tm1), t
    return t
