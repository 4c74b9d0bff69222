"""DIA matvec formulations at n=2^22, offsets [-1, 1] (flagship operator).

The production matvec uses y.at[slice].add(...) per diagonal; each such op
is a full-buffer update XLA may not fuse.  Variants:
  A: current (.at[].add)
  B: padded-x + static slices, one fused sum
  C: jnp.roll-based with edge masks
Run: python experiments/dia_matvec_variants.py
"""
import functools, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from lanczos_tpu.ops.operators import DIAOperator

n = 1 << 22
op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

def mv_pad(data, x):
    offs = op.offsets
    lo = max(0, max(-d for d in offs)) if offs else 0
    hi = max(0, max(d for d in offs)) if offs else 0
    xp = jnp.pad(x, (lo, hi))
    y = jnp.zeros_like(x)
    for j, d in enumerate(offs):
        row = data[j]
        if d > 0:
            row = row.at[n - d:].set(0)
        elif d < 0:
            row = row.at[:-d].set(0)
        y = y + row * jax.lax.dynamic_slice_in_dim(xp, lo + d, n)
    return y

def mv_roll(data, x):
    y = jnp.zeros_like(x)
    i = jnp.arange(n)
    for j, d in enumerate(op.offsets):
        xs = jnp.roll(x, -d)
        valid = (i + d >= 0) & (i + d < n)
        y = y + jnp.where(valid, data[j] * xs, 0.0)
    return y

def marginal(run_k, ks, kl, repeats=5):
    _ = np.asarray(run_k(ks).ravel()[0]); _ = np.asarray(run_k(kl).ravel()[0])
    ds = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = np.asarray(run_k(ks).ravel()[0]); a = time.perf_counter()-t0
        t0 = time.perf_counter(); _ = np.asarray(run_k(kl).ravel()[0]); b = time.perf_counter()-t0
        ds.append((b - a) / (kl - ks))
    return float(np.median(ds))

variants = {
    "A_at_add": lambda d, v: op.matvec(v),
    "B_padded": mv_pad,
    "C_roll": mv_roll,
}
ref = None
for name, mv in variants.items():
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(data, v, k, mv=mv):
        return jax.lax.fori_loop(0, k, lambda _, vv: mv(data, vv) * 0.25, v)
    out = np.asarray(chain(op.data, x, 3))
    if ref is None: ref = out
    err = float(np.abs(out - ref).max())
    t = marginal(lambda k: chain(op.data, x, k), 64, 192)
    print(f"{name:10s}: {t*1e6:7.1f} us/matvec   max|Δ|={err:.2e}", flush=True)
