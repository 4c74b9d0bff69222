"""On-chip validation of precise_vectors: reference-grade eigenvalues from
pure f32 TPU arithmetic (VERDICT round-2 item 1 'done' criterion)."""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from lanczos_tpu import LambdaLanczos, DIAOperator

out = {"backend": jax.default_backend()}
print("start", flush=True)

# n=1024 chain — the VERDICT target case: <=1e-10 on the real chip
n = 1024
op = DIAOperator.from_diagonals([-1,1],[np.full(n,-1.0,np.float32),np.full(n,-1.0,np.float32)], n)
eng = LambdaLanczos(op, find_maximum=False, num_eigs=4, dtype=np.float32)
eng.precise_vectors = True; eng.eps = 1e-13
eng.initial_buffer_size = n  # single compile stage
t0=time.time(); vals, vecs = eng.run(); t1=time.time()-t0
t0=time.time(); vals, vecs = eng.run(); t2=time.time()-t0
exact = np.sort(-2.0*np.cos(np.pi*np.arange(1,n+1)/(n+1)))[:4]
print("chain done", flush=True)
out["chain_n1024"] = {
    "max_eig_err": float(np.max(np.abs(np.sort(np.asarray(vals))-exact))),
    "first_run_s": round(t1,2), "second_run_s": round(t2,2),
    "iters": eng.iteration_counts,
}

# f32 baseline (same chip, same matrix) for the cost multiplier
engb = LambdaLanczos(op, find_maximum=False, num_eigs=4, dtype=np.float32)
engb.eps = 1e-6
t0=time.time(); valsb, _ = engb.run(); t1b=time.time()-t0
t0=time.time(); valsb, _ = engb.run(); t2b=time.time()-t0
print("f32 done", flush=True)
out["chain_f32_df64scalar"] = {
    "max_eig_err": float(np.max(np.abs(np.sort(np.asarray(valsb))-exact))),
    "second_run_s": round(t2b,2), "iters": engb.iteration_counts,
}

# dense random
rng = np.random.default_rng(3)
a = rng.standard_normal((256,256)).astype(np.float32); a=(a+a.T)/2
ref = np.linalg.eigvalsh(a.astype(np.float64))
engd = LambdaLanczos(jnp.asarray(a), find_maximum=True, dtype=np.float32)
engd.precise_vectors = True; engd.eps = 1e-12
val, _ = engd.run_one()
out["dense256_err"] = float(abs(val-ref[-1]))
print(json.dumps(out))
