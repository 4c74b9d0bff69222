"""Does JAX's persistent compilation cache work through the axon TPU tunnel?

If the PJRT plugin supports executable serialization, setting
``jax_compilation_cache_dir`` makes every process after the first skip the
30-120 s remote compiles — the production cold-start fix for the fused
engines.  This probe compiles a representative fused while_loop twice in
two subprocesses sharing a cache dir and reports both compile walls.

Run: python experiments/compile_cache_probe.py   (spawns its own children)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

CHILD = r"""
import os, sys, time
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import jax.numpy as jnp
from lanczos_tpu.ops.operators import DIAOperator
from lanczos_tpu.solvers.lanczos_fused import fused_krylov

n = 1 << 20
op = DIAOperator.from_diagonals([-1, 1], [np.full(n, -1.0, np.float32)] * 2, n)
v0 = jnp.ones((n,), jnp.float32) / np.sqrt(n)
defl = jnp.zeros((1, n), jnp.float32)
mask = jnp.zeros((1,), jnp.float32)
t0 = time.perf_counter()
r = fused_krylov(op, v0, defl, mask, 1e-6, 0.0, nroot=1, m_cap=64,
                 find_maximum=False, reorth_policy="selective")
_ = np.asarray(r[3])
print("WALL", round(time.perf_counter() - t0, 2), flush=True)
"""


def main():
    repo = str(Path(__file__).resolve().parent.parent)
    cache = tempfile.mkdtemp(prefix="jaxcache_")
    env = dict(os.environ, REPO=repo, CACHE_DIR=cache)
    walls = []
    for run in ("cold", "hot"):
        out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                             capture_output=True, text=True, timeout=600)
        wall = None
        for line in out.stdout.splitlines():
            if line.startswith("WALL"):
                wall = float(line.split()[1])
        walls.append(wall)
        print(run, wall, "s", (out.stderr.strip()[-300:] if wall is None else ""), flush=True)
    n_entries = len(list(Path(cache).rglob("*")))
    print(json.dumps({"cold_s": walls[0], "hot_s": walls[1], "cache_entries": n_entries}))


if __name__ == "__main__":
    main()
