"""ctypes bindings for the native host kernels (see host_kernels.cpp)."""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from .build import shared_object_path

__all__ = [
    "available",
    "tridiagonal_eigh",
    "tridiagonal_eigvals_bisect",
    "tridiagonal_eigh_bisect",
    "pack_bsr",
    "consume_unconverged",
]

# Running total of small-solve blocks that hit the QL iteration cap (the
# reference's forced-break count, tridiagonal_impl.hpp:290-343 return value).
# api.run() snapshots this around a solve and surfaces the delta in RunStats
# so a non-converged tridiagonal solve is visible instead of silent.
_UNCONVERGED_TOTAL = 0


def consume_unconverged() -> int:
    """Return the accumulated unconverged-block count since process start."""
    return _UNCONVERGED_TOTAL

_i64 = ctypes.c_int64
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


@functools.cache
def _lib():
    path = shared_object_path()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.lt_tridiagonal_eigh.restype = ctypes.c_int
    lib.lt_tridiagonal_eigh.argtypes = [_f64p, _f64p, _i64, _f64p, _f64p, ctypes.c_int]
    lib.lt_tridiagonal_eigvals_bisect.restype = None
    lib.lt_tridiagonal_eigvals_bisect.argtypes = [_f64p, _f64p, _i64, _i64, _i64, _f64p]
    lib.lt_tridiagonal_eigh_bisect.restype = None
    lib.lt_tridiagonal_eigh_bisect.argtypes = [_f64p, _f64p, _i64, _i64, _i64, _f64p, _f64p]
    lib.lt_bsr_count.restype = _i64
    lib.lt_bsr_count.argtypes = [_i64p, _i64p, _i64, _i64, _i64, _i64, _i64p]
    lib.lt_bsr_fill_f32.restype = None
    lib.lt_bsr_fill_f32.argtypes = [_i64p, _i64p, _f32p, _i64, _i64, _i64, _i64, _i64p, _i64, _i64p, _f32p]
    lib.lt_bsr_fill_f64.restype = None
    lib.lt_bsr_fill_f64.argtypes = [_i64p, _i64p, _f64p, _i64, _i64, _i64, _i64, _i64p, _i64, _i64p, _f64p]
    return lib


def available() -> bool:
    return _lib() is not None


def _require_lib():
    lib = _lib()
    if lib is None:
        raise RuntimeError(
            "native host-kernel extension is not built (run lanczos_tpu/native/build.py "
            "or use a python backend: tridiag_backend='lapack'/'numpy')"
        )
    return lib


def _validate_tridiag(alpha, beta, first=None, count=None):
    m = alpha.shape[0]
    if beta.shape[0] < max(m - 1, 0):
        raise ValueError(f"beta must have at least m-1 entries, got {beta.shape[0]} for m={m}")
    if first is not None and not (0 <= first and first + count <= m):
        raise ValueError(f"eigenvalue index range [{first}, {first + count}) out of [0, {m})")



def tridiagonal_eigh(alpha, beta, *, eigvals_only: bool = False):
    """Native implicit-shift QL eigensolver (row-per-vector layout, ascending).

    Counterpart of the reference's self-contained QR backend
    (lambda_lanczos_tridiagonal_impl.hpp:290-343)."""
    global _UNCONVERGED_TOTAL
    lib = _require_lib()
    alpha = np.ascontiguousarray(alpha, dtype=np.float64)
    beta = np.ascontiguousarray(beta, dtype=np.float64)
    m = alpha.shape[0]
    _validate_tridiag(alpha, beta)
    eigvals = np.empty(m, dtype=np.float64)
    if eigvals_only:
        # Vectors still cheap for small m; use a scratch but skip rotation work.
        scratch = np.empty(0, dtype=np.float64)
        rc = lib.lt_tridiagonal_eigh(alpha, beta, m, eigvals, scratch, 0)
        _UNCONVERGED_TOTAL += int(rc)
        return (eigvals,)
    eigvecs = np.empty((m, m), dtype=np.float64)
    rc = lib.lt_tridiagonal_eigh(alpha, beta, m, eigvals, eigvecs, 1)
    _UNCONVERGED_TOTAL += int(rc)
    return eigvals, eigvecs


def tridiagonal_eigvals_bisect(alpha, beta, first: int, count: int):
    """Sturm bisection: eigenvalues with ascending indices [first, first+count)."""
    lib = _require_lib()
    alpha = np.ascontiguousarray(alpha, dtype=np.float64)
    beta = np.ascontiguousarray(beta, dtype=np.float64)
    _validate_tridiag(alpha, beta, first, count)
    out = np.empty(count, dtype=np.float64)
    lib.lt_tridiagonal_eigvals_bisect(alpha, beta, alpha.shape[0], first, count, out)
    return out


def tridiagonal_eigh_bisect(alpha, beta, first: int, count: int):
    """Bisection eigen*pairs*: ascending-index eigenvalues [first, first+count)
    with backward-recurrence eigenvectors (row-per-vector layout).

    Native counterpart of the reference's bisection eigenpairs path
    (lambda_lanczos_tridiagonal_impl.hpp:93-134)."""
    lib = _require_lib()
    alpha = np.ascontiguousarray(alpha, dtype=np.float64)
    beta = np.ascontiguousarray(beta, dtype=np.float64)
    m = alpha.shape[0]
    _validate_tridiag(alpha, beta, first, count)
    vals = np.empty(count, dtype=np.float64)
    vecs = np.empty((count, m), dtype=np.float64)
    lib.lt_tridiagonal_eigh_bisect(alpha, beta, m, first, count, vals, vecs)
    return vals, vecs


def pack_bsr(rows, cols, vals, n_col_blocks: int, bm: int, bk: int, *, dtype=np.float32):
    """COO -> BSR packing (duplicates summed). Returns (block_ids, blocks).

    ``block_ids[j] = row_block * n_col_blocks + col_block`` sorted ascending;
    ``blocks`` has shape (nblocks, bm, bk) in ``dtype`` (float32 or float64).
    """
    lib = _require_lib()
    dtype = np.dtype(dtype)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nnz = rows.shape[0]
    scratch = np.empty(nnz, dtype=np.int64)
    nblocks = lib.lt_bsr_count(rows, cols, nnz, bm, bk, n_col_blocks, scratch)
    block_ids = np.empty(nblocks, dtype=np.int64)
    blocks = np.empty((nblocks, bm, bk), dtype=dtype)
    if dtype == np.float64:
        vals = np.ascontiguousarray(vals, dtype=np.float64)
        lib.lt_bsr_fill_f64(rows, cols, vals, nnz, bm, bk, n_col_blocks, scratch, nblocks, block_ids, blocks)
    else:
        vals = np.ascontiguousarray(vals, dtype=np.float32)
        lib.lt_bsr_fill_f32(rows, cols, vals, nnz, bm, bk, n_col_blocks, scratch, nblocks, block_ids, blocks)
    return block_ids, blocks
