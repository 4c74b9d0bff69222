"""v3: bf16-shadow projection — phase 0 reads a bf16 copy of the basis.

One CGS pass must read the k live rows twice (projection, then update;
VMEM cannot hold them at n=4M), so v2's floor is 2kn f32 reads.  The
PROJECTION read can be bf16: the coefficient error from bf16-rounded rows
is ~|e||w|/sqrt(n) ~ 4e-3/2048 ~ 2e-6 relative at n=4M — the same order
as the f32 dot-product floor itself, and far below the selective-reorth
trigger threshold sqrt(eps)=1.2e-4.  The UPDATE must stay f32 (its error
lands directly in w).  Traffic per pass: kn*(2+4) bytes = 0.75x v2.

The bf16 shadow costs one n-row bf16 write per iteration (the engine
would maintain it at the normalize/store step) and 50% extra HBM
capacity for the basis.

Run: python experiments/pallas_bcgs_kernel3.py
"""
import functools, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lanczos_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from lanczos_tpu.core import linalg

HIGH = jax.lax.Precision.HIGHEST


def make_pass(chunk, bn, cap_rows):
    cap_chunks = (cap_rows + chunk - 1) // chunk

    def kernel(k_ref, basis_bf_ref, basis_ref, v_ref, out_ref, c_acc):
        ph = pl.program_id(0); j = pl.program_id(1); ci = pl.program_id(2)
        kk = k_ref[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + ci * chunk

        @pl.when(ph == 0)
        def _proj():
            @pl.when(j == 0)
            def _zero_row():
                c_acc[pl.ds(ci * chunk, chunk), :] = jnp.zeros((chunk, 1), jnp.float32)
            rows_bf = jnp.where(ri < kk, basis_bf_ref[...].astype(jnp.float32), 0.0)
            cur = c_acc[pl.ds(ci * chunk, chunk), :]
            c_acc[pl.ds(ci * chunk, chunk), :] = cur + jnp.sum(
                rows_bf * v_ref[...][None, :], axis=1, keepdims=True)
            out_ref[...] = v_ref[...]  # preserve aliased v (see pallas_cgs.py)

        @pl.when(ph == 1)
        def _update():
            rows = jnp.where(ri < kk, basis_ref[...], 0.0)
            c = c_acc[pl.ds(ci * chunk, chunk), :]
            upd = jax.lax.dot_general(
                c.T, rows, (((1,), (0,)), ((), ())),
                precision=HIGH, preferred_element_type=jnp.float32)[0]
            @pl.when(ci == 0)
            def _init():
                out_ref[...] = v_ref[...] - upd
            @pl.when(ci != 0)
            def _acc():
                out_ref[...] = out_ref[...] - upd

    def one_pass(v, basis_bf, basis, k):
        n = basis.shape[1]
        nchunks = (jnp.asarray(k, jnp.int32) + chunk - 1) // chunk
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(2, n // bn, nchunks),
                in_specs=[
                    pl.BlockSpec((chunk, bn), lambda ph, j, ci, k_ref: (ci, j)),
                    pl.BlockSpec((chunk, bn), lambda ph, j, ci, k_ref: (ci, j)),
                    pl.BlockSpec((bn,), lambda ph, j, ci, k_ref: (j,)),
                ],
                out_specs=pl.BlockSpec((bn,), lambda ph, j, ci, k_ref: (j,)),
                scratch_shapes=[pltpu.VMEM((cap_chunks * chunk, 1), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            input_output_aliases={3: 0},
        )(jnp.asarray([k], jnp.int32), basis_bf, basis, v)

    return one_pass


def marginal(run_k, ks, kl, repeats=5):
    _ = np.asarray(run_k(ks).ravel()[0]); _ = np.asarray(run_k(kl).ravel()[0])
    ds = []
    for _i in range(repeats):
        t0 = time.perf_counter(); _ = np.asarray(run_k(ks).ravel()[0]); a = time.perf_counter()-t0
        t0 = time.perf_counter(); _ = np.asarray(run_k(kl).ravel()[0]); b = time.perf_counter()-t0
        ds.append((b - a) / (kl - ks))
    return float(np.median(ds))


def main():
    n = 1 << 22
    cap = 257
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mkdata(key):
        kb, kv = jax.random.split(key)
        basis = jax.random.normal(kb, (cap, n), jnp.float32)
        basis = basis / jnp.linalg.norm(basis, axis=1, keepdims=True)
        v = jax.random.normal(kv, (n,), jnp.float32)
        v = v + basis[:8].sum(axis=0) * 100.0
        return basis, basis.astype(jnp.bfloat16), v

    basis, basis_bf, v = mkdata(key)
    _ = np.asarray(v.ravel()[0])
    print("data ready", flush=True)

    # Correctness: residual live-row overlap after ONE v3 pass vs one f32 pass.
    def overlap(w, k):
        c = jnp.max(jnp.abs(jnp.matmul(basis[:k], w, precision=HIGH)))
        return float(c / jnp.linalg.norm(w))

    jx = jax.jit(lambda v, k: linalg.orthogonalize_bcgs_dyn(v, basis, k, passes=1, use_pallas=True))
    p = make_pass(64, 2048, cap)
    for k in (3, 100, 256):
        got = p(v, basis_bf, basis, k)
        ref = jx(v, jnp.asarray(k, jnp.int32))
        print(f"k={k}: overlap after v3 pass = {overlap(got, k):.2e}  after f32 pass = {overlap(ref, k):.2e}", flush=True)

    for chunk, bn in [(64, 2048), (64, 4096), (64, 8192)]:
        p = make_pass(chunk, bn, cap)
        def chain(basis_bf, basis, v, k, reps, _p=p):
            def body(i, vv):
                return _p(vv * (1.0 + 1e-7), basis_bf, basis, k)
            return jax.lax.fori_loop(0, reps, body, v)
        jc = jax.jit(chain, static_argnames=("reps",))
        for k in (64, 128, 256):
            kd = jnp.asarray(k, jnp.int32)
            bytes_pass = k * n * (2 + 4)
            t = marginal(lambda r: jc(basis_bf, basis, v, kd, reps=r), 4, 12)
            print(f"chunk={chunk:3d} bn={bn:4d} k={k:3d}: v3 {t*1e3:6.2f} ms ({bytes_pass/t/1e9:5.0f} GB/s eff, {2*k*n*4/t/1e9:5.0f} GB/s f32-equiv)", flush=True)


if __name__ == "__main__":
    main()
