"""v2: single-drain classical-CGS pallas pass — grid (2, n_tiles, nchunks).

v1 (pallas_bcgs_kernel.py) fused proj+update per chunk (block-MGS) but paid
a pipeline drain per chunk phase and hit only ~750 GB/s.  Here the pass is
CLASSICAL GS over the live rows (exactly what the monolithic masked CGS
computes): phase 0 accumulates ALL live-chunk coefficients against the
original v, phase 1 applies one combined update — one data dependency for
the whole pass.  The update dot carries precision=HIGHEST (default MXU f32
is bf16 passes; coefficients applied at bf16 would leave ~1e-3 residual
overlap and break the omega/selective machinery).

Run: python experiments/pallas_bcgs_kernel2.py
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

def make_pass(chunk, bn, cap_rows, precision=HIGH):
    cap_chunks = (cap_rows + chunk - 1) // chunk

    def kernel(k_ref, basis_ref, v_ref, out_ref, c_acc):
        ph = pl.program_id(0); j = pl.program_id(1); ci = pl.program_id(2)
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
                rows * v_ref[...][None, :], axis=1, keepdims=True)
            # v is aliased to out: every mapped out block is written back
            # when its index changes, so copy v through or phase 1 reads
            # a clobbered buffer (measured: rel err ~1 without this).
            out_ref[...] = v_ref[...]

        @pl.when(ph == 1)
        def _update():
            c = c_acc[pl.ds(ci * chunk, chunk), :]          # (chunk, 1)
            upd = jax.lax.dot_general(
                c.T, rows, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)[0]
            @pl.when(ci == 0)
            def _init():
                out_ref[...] = v_ref[...] - upd
            @pl.when(ci != 0)
            def _acc():
                out_ref[...] = out_ref[...] - upd

    def one_pass(v, basis, k):
        n = basis.shape[1]
        nchunks = (jnp.asarray(k, jnp.int32) + chunk - 1) // chunk
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
        )(jnp.asarray([k], jnp.int32), basis, v)

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
    # Generate on DEVICE: host->device upload through the tunnel is ~2.6 MB/s
    # (a 4.3 GB basis would take ~28 min and looked like a hang).
    n = 1 << 22
    cap = 257
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mkdata(key):
        kb, kv = jax.random.split(key)
        basis = jax.random.normal(kb, (cap, n), jnp.float32)
        basis = basis / jnp.linalg.norm(basis, axis=1, keepdims=True)
        v = jax.random.normal(kv, (n,), jnp.float32)
        v = v + basis[:8].sum(axis=0) * 100.0  # strong live-row components
        return basis, v

    basis, v = mkdata(key)
    _ = np.asarray(v.ravel()[0])
    print("data ready", flush=True)

    # Correctness vs the production XLA chunk loop (on-device, f32): the two
    # formulations agree to f32 rounding; the f64 ground-truth check lives in
    # pallas_bcgs_k2_tiny.py at uploadable sizes.
    def xla_pass(v, basis, k):
        return linalg.orthogonalize_bcgs_dyn(v, basis, k, passes=1)
    jx = jax.jit(xla_pass)
    vmax = float(jnp.max(jnp.abs(v)))
    for prec, pname in [(HIGH, "HIGH"), (jax.lax.Precision.DEFAULT, "DEF ")]:
        p = make_pass(64, 2048, cap, prec)
        for k in (3, 100, 256):
            got = p(v, basis, k)
            ref = jx(v, basis, jnp.asarray(k, jnp.int32))
            err = float(jnp.max(jnp.abs(got - ref))) / vmax
            print(f"prec={pname} k={k}: rel err vs XLA chunk loop = {err:.2e}", flush=True)

    def chain_xla(basis, v, k, reps):
        def body(i, vv):
            return linalg.orthogonalize_bcgs_dyn(vv * (1.0 + 1e-7), basis, k, passes=1)
        return jax.lax.fori_loop(0, reps, body, v)
    jc_x = jax.jit(chain_xla, static_argnames=("reps",))
    for k in (64, 128, 256):
        kd = jnp.asarray(k, jnp.int32)
        t_x = marginal(lambda r: jc_x(basis, v, kd, reps=r), 4, 12)
        print(f"xla chunk loop k={k:3d}: {t_x*1e3:6.2f} ms ({2*k*n*4/t_x/1e9:5.0f} GB/s)", flush=True)

    for chunk, bn in [(64, 2048), (64, 4096), (64, 8192), (128, 4096)]:
        p = make_pass(chunk, bn, cap)
        def chain_pal(basis, v, k, reps, _p=p):
            def body(i, vv):
                return _p(vv * (1.0 + 1e-7), basis, k)
            return jax.lax.fori_loop(0, reps, body, v)
        jc_p = jax.jit(chain_pal, static_argnames=("reps",))
        for k in (64, 128, 256):
            kd = jnp.asarray(k, jnp.int32)
            bytes_pass = 2 * k * n * 4
            t_p = marginal(lambda r: jc_p(basis, v, kd, reps=r), 4, 12)
            print(f"chunk={chunk:3d} bn={bn:4d} k={k:3d}: pallas-cgs {t_p*1e3:6.2f} ms ({bytes_pass/t_p/1e9:5.0f} GB/s)", flush=True)

if __name__ == "__main__":
    main()
