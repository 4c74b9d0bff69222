"""Headline benchmark: Pallas BSR SpMV throughput vs. the HBM roofline.

The reference publishes no performance numbers (BASELINE.md), so the baseline
is the derived speed-of-light: a BSR matvec must stream every stored nonzero
from HBM once, so nnz/s_max = membw / bytes_per_nnz.  The achievable membw is
*measured* on the same chip with a pure streaming kernel over an equally sized
array (self-calibrating — no hardcoded chip specs), and

    vs_baseline = achieved_spmv_bandwidth / measured_stream_bandwidth

i.e. 1.0 means the sparse matvec runs at the chip's demonstrated memory speed.

Methodology: the K iterations run *inside one jit* as a ``lax.fori_loop``
(single dispatch — per-call/tunnel latency would otherwise dominate), the
sync point is a host transfer of one element, and the per-iteration time is
the *difference* between a long and a short chain, cancelling fixed dispatch
and loop-setup overhead.

Deadline discipline (round 4; BENCH_r03 was rc=124/parsed-null because the
driver killed the process before any output): results accumulate in a
module-level RESULT as each section completes, every section runs under a
SIGALRM budget clamped to the global deadline, and the alarm handler PRINTS
the partial JSON and exits 0 — a sick tunnel or an overrunning section now
forfeits only the sections that hadn't finished, never the artifact.

Prints exactly one JSON line.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re
import signal
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# Deadline-proof result plumbing
# ---------------------------------------------------------------------------

GLOBAL_DEADLINE_S = 900.0  # well under the driver budget that killed r03
_T0 = time.monotonic()

RESULT: dict = {
    "metric": "bsr_spmv_throughput",
    "value": None,
    "unit": "Gnnz/s",
    "vs_baseline": None,
    "extra": {},
}
EXTRA = RESULT["extra"]
_EMITTED = False
_CURRENT_SECTION = "startup"


def _emit() -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    _finalize_vs_prev()
    print(json.dumps(RESULT), flush=True)


class _SectionTimeout(Exception):
    pass


def _on_alarm(_sig, _frm) -> None:
    # Two-tier deadline handling (round-4 review): a section that merely
    # OVERRAN its budget on a healthy tunnel is salvaged by raising —
    # run_section records the overrun and the remaining sections still run.
    # But a raise only materializes when the blocked call returns, which a
    # DEAD tunnel never does — so before raising, re-arm the alarm for the
    # global deadline: if the process is still stuck when it fires (or the
    # global budget is simply gone), emit the partial JSON and exit 0 so
    # the driver captures a parseable artifact instead of rc=124.
    rem = _remaining()
    if rem <= 10.0:
        EXTRA.setdefault("deadline_hit", []).append(_CURRENT_SECTION)
        print(
            f"bench.py: global deadline hit in section '{_CURRENT_SECTION}' at "
            f"{time.monotonic() - _T0:.0f}s — emitting partial results",
            file=sys.stderr,
            flush=True,
        )
        _emit()
        os._exit(0)
    signal.alarm(int(rem) + 1)  # hard backstop stays armed through the raise
    raise _SectionTimeout(_CURRENT_SECTION)


def _remaining() -> float:
    return GLOBAL_DEADLINE_S - (time.monotonic() - _T0)


def run_section(name: str, budget_s: float, fn) -> None:
    """Run one bench section under a SIGALRM budget.

    The budget is clamped to the global deadline's remaining time; when too
    little remains the section is skipped and recorded, so the final JSON
    says explicitly what was not measured (no silent truncation).  A budget
    overrun raises out of the section (recorded as `<name>_timeout`) and the
    NEXT sections still run — only the global deadline ends the process."""
    global _CURRENT_SECTION
    rem = _remaining()
    if rem < 25.0:
        EXTRA.setdefault("skipped", []).append(name)
        return
    _CURRENT_SECTION = name
    t0 = time.monotonic()
    signal.alarm(int(min(budget_s, rem)) + 1)
    try:
        fn()
    except _SectionTimeout:
        EXTRA.setdefault("section_timeout", []).append(name)
    except Exception as e:  # noqa: BLE001 — a failed section must not kill the artifact
        EXTRA[f"{name}_error"] = repr(e)[:200]
    finally:
        signal.alarm(0)
        _CURRENT_SECTION = "between-sections"
        EXTRA.setdefault("section_s", {})[name] = round(time.monotonic() - t0, 1)


# ---------------------------------------------------------------------------
# vs_prev regression tripwire (VERDICT r3 item 7)
# ---------------------------------------------------------------------------

# higher-is-better keys compared against the newest parseable BENCH_r*.json;
# chip drift moves spmv_gbps and stream_gbps together, a kernel regression
# moves only spmv_gbps (BASELINE.md).
_HIB_KEYS = (
    "spmv_gbps",
    "stream_gbps",
    "lanczos_full_iters_per_s",
    "lanczos_selective_iters_per_s",
)
# lower-is-better wall-clock keys (ratio inverted before the 15% test)
_LIB_KEYS = (
    "flagship_cheby_s",
    "pv_thick_n2p20_wall_s",
    "expm_evolve100_precise_ms_per_step",
    "precise_filter_n4000_s",
    "expm_cheby_t5_s",
    "expm_cheby_t5_precise_s",
)
# accuracy keys: flagged only when >100x worse (run-to-run spread is ~5x
# on eigenvalue-error floors, so the wall-clock threshold would cry wolf)
_ERR_KEYS = (
    "pv_chain256_eig_err",
    "pv_thick_n2p20_eig_err",
    "expm_ring100_angle_err",
    "expm_evolve100_precise_angle_err",
    "flagship_cheby_max_err",
    "precise_filter_n4000_err",
    "expm_cheby_t5_angle_err",
    "expm_cheby_t5_precise_angle_err",
)


def _load_prev_bench() -> tuple[str, dict] | None:
    root = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = doc.get("parsed")
        if not isinstance(parsed, dict) or parsed.get("value") is None:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, os.path.basename(path), parsed)
    return (best[1], best[2]) if best else None


def _finalize_vs_prev() -> None:
    try:
        prev = _load_prev_bench()
        if prev is None:
            return
        name, parsed = prev
        ratios: dict = {"ref": name}
        regressed: list = []

        def compare(key, cur, old):
            if cur is None or old in (None, 0):
                return
            r = float(cur) / float(old)
            ratios[key] = round(r, 3)
            if r < 0.85:
                regressed.append(key)

        compare("headline_gnnzs", RESULT["value"], parsed.get("value"))
        prev_extra = parsed.get("extra", {})
        for key in _HIB_KEYS:
            compare(key, EXTRA.get(key), prev_extra.get(key))
        for key in _LIB_KEYS:
            cur, old = EXTRA.get(key), prev_extra.get(key)
            if cur in (None, 0) or old is None:
                continue
            r = float(old) / float(cur)  # inverted: >1 means faster now
            ratios[key] = round(r, 3)
            if r < 0.85:
                regressed.append(key)
        for key in _ERR_KEYS:
            cur, old = EXTRA.get(key), prev_extra.get(key)
            if cur is None or old in (None, 0):
                continue
            r = float(cur) / float(old)
            if r > 100.0:
                ratios[key] = round(r, 1)
                regressed.append(key)
        EXTRA["vs_prev"] = ratios
        # Only flag regressions when comparing like with like: prior
        # artifacts are TPU runs (the driver's round-end bench), so a CPU
        # smoke run must not cry wolf.
        prev_backend = prev_extra.get("backend", "tpu")
        if regressed and EXTRA.get("backend") == prev_backend:
            EXTRA["regressed"] = regressed
        elif EXTRA.get("backend") != prev_backend:
            ratios["note"] = f"backend mismatch ({EXTRA.get('backend')} vs {prev_backend}) — regression check skipped"
    except Exception as e:  # noqa: BLE001 — the tripwire must never break emission
        EXTRA["vs_prev_error"] = repr(e)[:200]


# ---------------------------------------------------------------------------
# Timing helper
# ---------------------------------------------------------------------------


def _marginal_time(run_k, k_short, k_long, *, repeats=5):
    """Per-iteration seconds from the (k_long - k_short) timing difference.

    Median over repeats: robust to one-off dispatch hiccups that can make a
    single difference negative."""
    _ = np.asarray(run_k(k_short).ravel()[0])  # compile both
    _ = np.asarray(run_k(k_long).ravel()[0])
    diffs = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k_short).ravel()[0])
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(run_k(k_long).ravel()[0])
        t_l = time.perf_counter() - t0
        diffs.append((t_l - t_s) / (k_long - k_short))
    return float(np.median(diffs))


# ---------------------------------------------------------------------------
# Sections
# ---------------------------------------------------------------------------


def main() -> None:
    signal.signal(signal.SIGALRM, _on_alarm)
    try:
        _main_body()
    except _SectionTimeout:
        # startup (or between-sections code) hit its budget — emit whatever
        # exists rather than dying with no artifact
        EXTRA.setdefault("deadline_hit", []).append(_CURRENT_SECTION)
    finally:
        signal.alarm(0)
        _emit()


def _main_body() -> None:
    # Startup budget: first device contact through the tunnel can block
    # 100-500 s on a previous process's remote teardown (CLAUDE.md) — a
    # healthy chip must not be declared dead at 120 s (round-4 review).
    signal.alarm(540)

    import jax
    import jax.numpy as jnp

    from lanczos_tpu.utils.compile_cache import enable_compilation_cache

    # Persistent executable cache (deployment posture): repeat bench runs on
    # the same machine skip the 30-450 s remote compiles entirely.
    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    EXTRA["backend"] = jax.default_backend()
    signal.alarm(0)

    # ---- headline: BSR SpMV vs measured stream roofline ------------------
    def sec_spmv():
        from lanczos_tpu.ops.operators import BSROperator

        bm, bk = 128, 128  # roofline layout (see BSROperator docstring)
        if on_tpu:
            r, s = 512, 8  # 64 Mi nnz -> 256 MiB of f32 tiles
            k_short, k_long = 64, 192
        else:
            r, s = 32, 4  # keep the CPU smoke run quick
            k_short, k_long = 2, 6

        n_pad = r * bm
        # GENERATE the data on device (jax.random under jit): host-generated
        # arrays would UPLOAD through the remote-TPU tunnel (256 MiB of tiles
        # at the measured ~2.6 MB/s looks like a multi-minute hang —
        # CLAUDE.md).  Scaled so chained iterates neither overflow nor
        # denormalize in f32.  rmsk (pre-transposed) storage: the production
        # Pallas kernel's layout.
        kb, kc, kx = jax.random.split(jax.random.PRNGKey(0), 3)
        blocks = jax.jit(lambda k: jax.random.normal(k, (r, bm, s, bk), jnp.float32) * 0.01)(kb)
        col_blocks = jax.jit(
            lambda k: jax.random.randint(k, (r, s), 0, n_pad // bk, dtype=jnp.int32)
        )(kc)
        x = jax.jit(lambda k: jax.random.normal(k, (n_pad,), jnp.float32))(kx)

        # The operator arrays are jit *arguments* (a closure would bake
        # 256 MiB of tiles into the HLO as a literal — oversized compile
        # payload).
        @functools.partial(jax.jit, static_argnames=("k",))
        def spmv_chain(b, c, v, k):
            op = BSROperator(b, c, n_pad, layout="rmsk")
            return jax.lax.fori_loop(0, k, lambda _, vv: op.matvec(vv), v)

        # Measured streaming bandwidth on the same array.  The SpMV reads
        # 512x more than it writes, so the fair roofline is a *read* stream:
        # a full reduction whose input is scaled by the carried scalar (the
        # data dependence stops XLA hoisting the sum out of the loop; the
        # multiply fuses into the reduction, so each iteration reads the
        # array once).
        @functools.partial(jax.jit, static_argnames=("k",))
        def stream_chain(b, k):
            return jax.lax.fori_loop(
                0, k, lambda _, acc: jnp.sum(b * (1.0 + acc * 1e-30), dtype=jnp.float32), jnp.float32(0)
            )

        nnz = r * s * bm * bk
        spmv_bytes = nnz * 4 + n_pad * 4 * 2  # tiles + x read + y write

        # The chip's delivered bandwidth through the tunnel drifts ~+-5% over
        # minutes; measuring SpMV and the stream reference MINUTES apart
        # makes vs_baseline noisy.  Interleave them (spmv, stream, spmv,
        # stream, ...) so each ratio sees the same chip state, then medians.
        pairs = []
        for _rep in range(3):
            t_sp = _marginal_time(lambda k: spmv_chain(blocks, col_blocks, x, k), k_short, k_long, repeats=2)
            t_st = _marginal_time(lambda k: stream_chain(blocks, k), k_short, k_long, repeats=2)
            pairs.append((t_sp, t_st))
        t_spmv = float(np.median([p[0] for p in pairs]))
        t_stream = float(np.median([p[1] for p in pairs]))
        RESULT["value"] = round(nnz / t_spmv / 1e9, 3)
        RESULT["vs_baseline"] = round(
            float(np.median([(spmv_bytes / t_sp) / (blocks.size * 4 / t_st) for t_sp, t_st in pairs])), 3
        )
        # Raw GB/s alongside the ratio: chip bandwidth drifts run to run, so
        # future rounds need both absolutes to tell chip drift (both move)
        # from a kernel regression (only spmv_gbps moves).
        EXTRA["spmv_gbps"] = round(spmv_bytes / t_spmv / 1e9, 1)
        EXTRA["stream_gbps"] = round(blocks.size * 4 / t_stream / 1e9, 1)

    run_section("spmv", 300, sec_spmv)

    # ---- Lanczos iteration rate, fused engine, full vs selective ---------
    def sec_lanczos():
        from lanczos_tpu.ops.operators import DIAOperator
        from lanczos_tpu.solvers.lanczos_fused import fused_krylov

        nl = (1 << 20) if on_tpu else (1 << 12)
        m_s, m_l = (32, 96) if on_tpu else (8, 24)
        opl = DIAOperator.from_diagonals(
            [-1, 1], [jnp.full(nl, -1.0, jnp.float32), jnp.full(nl, -1.0, jnp.float32)], nl
        )
        v0 = jax.jit(
            lambda k: (lambda u: u / jnp.linalg.norm(u))(
                jax.random.uniform(k, (nl,), jnp.float32, -1.0, 1.0)
            )
        )(jax.random.PRNGKey(1))
        defl = jnp.zeros((1, nl), jnp.float32)
        mask = jnp.zeros((1,), jnp.float32)

        for policy in ("full", "selective"):
            def run(m_cap, policy=policy):
                # eps=-1: benchmark sentinel — the Sturm check runs on the
                # production cadence but can never stop the loop (eps==0
                # would skip the check; any positive eps is reachable when
                # consecutive estimates come out bit-identical).
                r = fused_krylov(
                    opl, v0, defl, mask, -1.0, 0.0,
                    nroot=1, m_cap=m_cap, find_maximum=False, reorth_policy=policy,
                    check_every=4,  # the engine default (LanczosConfig.resolved)
                )
                return r[3]
            t = _marginal_time(lambda m, _r=run: _r(m), m_s, m_l, repeats=3)
            # Guard the marginal method's premise: the sentinel must never
            # actually converge (bit-identical consecutive Sturm estimates
            # would pass a strict '<' drift test and truncate the chain).
            it_l = int(np.asarray(run(m_l)))
            if it_l != m_l:
                EXTRA[f"lanczos_{policy}_early_stop"] = it_l
            EXTRA[f"lanczos_{policy}_us_per_iter"] = round(t * 1e6, 1)
            EXTRA[f"lanczos_{policy}_iters_per_s"] = round(1.0 / t, 1)

    run_section("lanczos_iter", 240, sec_lanczos)

    # ---- precise_vectors accuracy on chip ---------------------------------
    def sec_pv_chain():
        from lanczos_tpu import LambdaLanczos, DIAOperator as _DIA

        np_ = 256
        opp = _DIA.from_diagonals(
            [-1, 1], [np.full(np_, -1.0, np.float32), np.full(np_, -1.0, np.float32)], np_
        )
        eng = LambdaLanczos(opp, find_maximum=False, dtype=np.float32)
        eng.precise_vectors = True
        eng.eps = 1e-13
        eng.initial_buffer_size = np_
        val, _vec = eng.run_one()
        EXTRA["pv_chain256_eig_err"] = float(abs(val - (-2.0 * np.cos(np.pi / (np_ + 1)))))

    run_section("pv_chain", 120, sec_pv_chain)

    # ---- exponentiator accuracy: overlap AND vector-level (angle) --------
    def sec_expm():
        # Ring Hamiltonian, imaginary a=3i (quantum evolution), vs the
        # plane-wave analytic truth.  The overlap criterion is the
        # reference's bar (machine_eps*1e2, exponentiator.hpp:58) but is
        # QUADRATIC in the state's angle error, so the honest vector-level
        # metric — the norm of the difference of normalized states in the
        # optimal phase gauge — is recorded alongside (VERDICT r3 item 4).
        from lanczos_tpu import Exponentiator as _Expo

        nr = 100
        h = np.zeros((nr, nr), np.float32)
        ir = np.arange(nr - 1)
        h[ir, ir + 1] = h[ir + 1, ir] = -1.0
        h[0, nr - 1] = h[nr - 1, 0] = -1.0
        kv = 2 * np.pi / nr * np.arange(nr)
        evs_r = -2.0 * np.cos(kv)
        u_r = np.exp(1j * np.outer(np.arange(nr), kv)) / np.sqrt(nr)
        vin = np.zeros(nr, np.complex128)
        vin[0], vin[-1], vin[50] = 1 + 2j, 1 + 2j, 8 + 2j
        vin /= np.linalg.norm(vin)
        truth_e = u_r @ (np.diag(np.exp(3.0j * evs_r)) @ (u_r.conj().T @ vin))
        ex = _Expo(jnp.asarray(h), dtype=np.float32)
        ex.eps = 1e-14
        (o_re, o_im), _it = ex.run_split(
            3.0j, jnp.asarray(vin.real, np.float32), jnp.asarray(vin.imag, np.float32)
        )
        out_e = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        tn = truth_e / np.linalg.norm(truth_e)
        on = out_e / np.linalg.norm(out_e)
        ip = np.vdot(tn, on)
        EXTRA["expm_ring100_overlap_err"] = float(abs(1.0 - abs(ip)))
        phase = ip / abs(ip) if abs(ip) > 0 else 1.0
        EXTRA["expm_ring100_angle_err"] = float(np.linalg.norm(on - phase * tn))

    run_section("expm", 120, sec_expm)

    # ---- 100-step evolve() drift at n=2^20 (vector-level) -----------------
    def sec_expm_evolve():
        # Open chain at n=2^20: eigenbasis is the type-I DST, so the exact
        # evolved state is computable on host in f64.  100 steps of
        # exp(0.05i*H) == exp(5i*H); records the compounding direction/phase
        # drift that the per-step overlap metric cannot see.
        from scipy.fft import dst

        from lanczos_tpu import DIAOperator as _DIA, Exponentiator as _Expo

        ne = (1 << 20) if on_tpu else (1 << 12)
        ope = _DIA.from_diagonals(
            [-1, 1], [np.full(ne, -1.0, np.float32), np.full(ne, -1.0, np.float32)], ne
        )
        rng = np.random.default_rng(7)
        v = rng.standard_normal(ne) + 1j * rng.standard_normal(ne)
        v /= np.linalg.norm(v)
        # truth: H = S diag(lam) S with S the orthonormal DST-I
        lam = -2.0 * np.cos(np.arange(1, ne + 1) * np.pi / (ne + 1))
        coef = dst(v, type=1, norm="ortho")
        truth = dst(np.exp(5.0j * lam) * coef, type=1, norm="ortho")
        ex = _Expo(ope, dtype=np.float32)
        steps = 100
        o_re, o_im = ex.evolve(
            0.05j,
            jnp.asarray(v.real, np.float32),
            jnp.asarray(v.imag, np.float32),
            steps,
            krylov_dim=16,
        )
        out = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        tn = truth / np.linalg.norm(truth)
        on = out / np.linalg.norm(out)
        ip = np.vdot(tn, on)
        phase = ip / abs(ip) if abs(ip) > 0 else 1.0
        EXTRA["expm_evolve100_overlap_err"] = float(abs(1.0 - abs(ip)))
        EXTRA["expm_evolve100_angle_err"] = float(np.linalg.norm(on - phase * tn))

    run_section("expm_evolve", 180, sec_expm_evolve)

    # ---- Chebyshev propagator: same workload as ONE matvec chain ---------
    def sec_expm_cheby():
        # Identical DST-I truth protocol to sec_expm_evolve (exp(5i*H) on
        # the n=2^20 chain), but the whole evolution is a single
        # Tal-Ezer/Kosloff chain (solvers/cheby_expm.py) — no per-step
        # Krylov builds.  Records f32-chain and df64-chain walls + angles
        # (round-4 final measurements: 0.17 s/3.0e-7 and 0.97 s/3.9e-14
        # for the t=50 workload, experiments/tpu_cheby_expm.py).
        from scipy.fft import dst

        from lanczos_tpu import DIAOperator as _DIA5, Exponentiator as _Expo5

        ne = (1 << 20) if on_tpu else (1 << 12)
        ope = _DIA5.from_diagonals(
            [-1, 1], [np.full(ne, -1.0, np.float32), np.full(ne, -1.0, np.float32)], ne
        )
        rng = np.random.default_rng(7)
        v = rng.standard_normal(ne) + 1j * rng.standard_normal(ne)
        v /= np.linalg.norm(v)
        lam = -2.0 * np.cos(np.arange(1, ne + 1) * np.pi / (ne + 1))
        coef = dst(v, type=1, norm="ortho")
        truth = dst(np.exp(5.0j * lam) * coef, type=1, norm="ortho")
        tn = truth / np.linalg.norm(truth)

        def angle(o_re, o_im):
            out = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
            on = out / np.linalg.norm(out)
            ip = np.vdot(tn, on)
            phase = ip / abs(ip) if abs(ip) > 0 else 1.0
            return float(np.linalg.norm(on - phase * tn))

        ex = _Expo5(ope, dtype=np.float32)
        vr = v.real.astype(np.float32)
        vi = v.imag.astype(np.float32)
        ex.run_chebyshev(5.0j, vr, vi, lo=-2.0, hi=2.0)  # warm compile
        t0 = time.perf_counter()
        (o_re, o_im), terms = ex.run_chebyshev(5.0j, vr, vi, lo=-2.0, hi=2.0)
        _ = np.asarray(jnp.ravel(o_re)[0])  # host-transfer sync
        EXTRA["expm_cheby_t5_s"] = round(time.perf_counter() - t0, 3)
        EXTRA["expm_cheby_t5_terms"] = int(terms)
        EXTRA["expm_cheby_t5_angle_err"] = angle(o_re, o_im)

        ex.run_chebyshev(5.0j, v.real, v.imag, lo=-2.0, hi=2.0, precise=True)
        t0 = time.perf_counter()
        (p_re, p_im), _t2 = ex.run_chebyshev(
            5.0j, v.real, v.imag, lo=-2.0, hi=2.0, precise=True)
        EXTRA["expm_cheby_t5_precise_s"] = round(time.perf_counter() - t0, 3)
        EXTRA["expm_cheby_t5_precise_angle_err"] = angle(p_re, p_im)

    run_section("expm_cheby", 150, sec_expm_cheby)

    # ---- flagship: Chebyshev-filtered n=4.19M solve ----------------------
    def sec_flagship_cheby():
        # The adopted flagship config (round 4 final, BASELINE.md):
        # filtered Lanczos, degree=400, mu=1e-5, analytic chain bounds,
        # B-space budget max_restarts=2 x max_iteration=48.  With the
        # adaptive span-RR one 89-row round solves it: 5.1 s warm median
        # at errors <=7.4e-8 (experiments/tpu_flagship_cheby.py).
        # Recorded here as ONE warm pass (run-to-run spread +-1-3 s —
        # treat small deltas as noise).
        from lanczos_tpu import DIAOperator as _DIA3, filtered_lanczos

        nf = (1 << 22) if on_tpu else (1 << 12)
        opf = _DIA3.from_diagonals(
            [-1, 1], [jnp.full(nf, -1.0, jnp.float32), jnp.full(nf, -1.0, jnp.float32)], nf
        )

        def _cfg(eng):
            eng.max_restarts = 2
            eng.max_iteration = 48

        t0 = time.perf_counter()
        vals_f, _vecs_f, _info = filtered_lanczos(
            opf, num_eigs=3, degree=400, mu=1e-5, lo=-2.0, hi=2.0, configure=_cfg
        )
        EXTRA["flagship_cheby_s"] = round(time.perf_counter() - t0, 1)
        exact_f = [-2.0 * np.cos((k + 1) * np.pi / (nf + 1)) for k in range(3)]
        EXTRA["flagship_cheby_max_err"] = float(
            max(abs(float(vals_f[i]) - exact_f[i]) for i in range(3))
        )

    run_section("flagship_cheby", 280, sec_flagship_cheby)

    # ---- precise_vectors x thick restart: bounded-memory accuracy --------
    def sec_pv_thick():
        # n>=2^20 degenerate clustered spectrum, <=128-row basis: the
        # reference's f64-grade tolerance in pure f32 bounded memory.
        # Block-diagonal chain: every eigenvalue of the 128-site chain with
        # multiplicity n/128; 3 copies of the lowest via deflation.
        from lanczos_tpu import LambdaLanczos as _LL, DIAOperator as _DIA2

        npv = (1 << 20) if on_tpu else (1 << 11)
        nb = 128
        off = np.ones(npv - 1, np.float32)
        off[nb - 1 :: nb] = 0.0
        d = np.zeros((2, npv), np.float32)
        d[0, 1:] = -off
        d[1, : npv - 1] = -off
        opv = _DIA2.from_diagonals([-1, 1], jnp.asarray(d), npv)
        engv = _LL(opv, find_maximum=False, num_eigs=3, dtype=np.float32, mode="fused")
        engv.precise_vectors = True
        engv.restart_policy = "thick"
        engv.max_iteration = 128  # bounded basis: 128 rows at n=2^20
        engv.eps = 1e-11
        engv.eigenvalue_offset = -4.0
        t0 = time.perf_counter()
        vals_v, _ = engv.run()
        truth_v = -2.0 * np.cos(np.pi / (nb + 1))
        EXTRA["pv_thick_n2p20_eig_err"] = float(
            np.max(np.abs(np.sort(np.asarray(vals_v)) - truth_v))
        )
        EXTRA["pv_thick_n2p20_wall_s"] = round(time.perf_counter() - t0, 1)

    run_section("pv_thick", 300, sec_pv_thick)

    # ---- precise-filtered head-to-head point (round 4 final) -------------
    def sec_precise_filter():
        # Spectral inverse-map refinement: f64-exact eigenvalues from f32
        # hardware at filter cost (BASELINE.md round-4 table: n=4000 chain
        # 3 lowest at the reference's own eps=1e-12 problem — reference
        # C++ 905.5 s, this path 1.2 s warm, err 0.0).  ONE warm point so
        # the driver artifact carries the claim.
        from lanczos_tpu import DIAOperator as _DIA4, filtered_lanczos as _fl

        nh = 4000
        oph = _DIA4.from_diagonals(
            [-1, 1], [np.full(nh, -1.0, np.float32)] * 2, nh)
        exact_h = [-2.0 * np.cos((k + 1) * np.pi / (nh + 1)) for k in range(3)]
        _fl(oph, num_eigs=3, lo=-2.0, hi=2.0, precise=True)  # warm compile
        t0 = time.perf_counter()
        vals_h, vh, _ih = _fl(oph, num_eigs=3, lo=-2.0, hi=2.0, precise=True)
        EXTRA["precise_filter_n4000_s"] = round(time.perf_counter() - t0, 2)
        EXTRA["precise_filter_n4000_err"] = float(
            max(abs(float(vals_h[i]) - exact_h[i]) for i in range(3)))
        # round-5: the path refines vectors to the df floor by default —
        # record the true A-space residual (host f64 stencil apply)
        vh = np.asarray(vh, np.float64)
        res_v = 0.0
        for i in range(3):
            av = np.empty(nh)
            av[0] = -vh[i][1]
            av[-1] = -vh[i][-2]
            av[1:-1] = -(vh[i][:-2] + vh[i][2:])
            res_v = max(res_v, float(np.linalg.norm(av - vals_h[i] * vh[i])))
        EXTRA["precise_filter_n4000_vec_res"] = res_v

    run_section("precise_filter", 200, sec_precise_filter)

    # ---- CPU-mesh scaling sweep (subprocess) ------------------------------
    # Launched only AFTER the TPU wall-clock sections: its 8 busy CPU
    # workers would otherwise contend with the main process's host-side
    # orchestration and skew flagship_cheby_s / pv_thick wall times — the
    # very numbers the vs_prev tripwire compares (round-4 review).
    def sec_scaling():
        import subprocess as _sp

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        root = os.path.dirname(os.path.abspath(__file__))
        proc = _sp.Popen(
            [sys.executable, os.path.join(root, "benchmarks", "run_all.py"),
             "--only", "scaling", "--platform", "cpu"],
            stdout=_sp.PIPE, stderr=_sp.DEVNULL, text=True, env=env, cwd=root,
        )
        try:
            stdout, _ = proc.communicate(timeout=max(10.0, _remaining() - 15.0))
            line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
            EXTRA["scaling_cpu_mesh"] = json.loads(line).get("scaling")
        finally:
            if proc.poll() is None:
                proc.kill()

    run_section("scaling", 420, sec_scaling)

    # ---- df64 precise evolve (runs LAST: newest path, a blowup here must
    # not cost any other section) ------------------------------------------
    def sec_expm_evolve_precise():
        # Same DST-I protocol as sec_expm_evolve, through the df64-carried
        # evolve (solvers/exponentiator_precise.py): the vector-level drift
        # the f32 path accumulates (~5e-6/100 steps on chip) drops to the
        # df floor (measured 3.1e-12, experiments/tpu_precise_evolve.py).
        from scipy.fft import dst

        from lanczos_tpu import DIAOperator as _DIA4, Exponentiator as _Expo2

        ne = (1 << 20) if on_tpu else (1 << 11)
        ope = _DIA4.from_diagonals(
            [-1, 1], [np.full(ne, -1.0, np.float32), np.full(ne, -1.0, np.float32)], ne
        )
        rng = np.random.default_rng(7)
        v = rng.standard_normal(ne) + 1j * rng.standard_normal(ne)
        v /= np.linalg.norm(v)
        lam = -2.0 * np.cos(np.arange(1, ne + 1) * np.pi / (ne + 1))
        coef = dst(v, type=1, norm="ortho")
        steps = 100
        truth = dst(np.exp(1j * 0.05 * steps * lam) * coef, type=1, norm="ortho")
        ex = _Expo2(ope, dtype=np.float32)
        t0 = time.perf_counter()
        o_re, o_im = ex.evolve(0.05j, v.real, v.imag, steps, krylov_dim=16, precise=True)
        wall = time.perf_counter() - t0
        out = o_re + 1j * o_im
        tn = truth / np.linalg.norm(truth)
        on = out / np.linalg.norm(out)
        ip = np.vdot(tn, on)
        phase = ip / abs(ip) if abs(ip) > 0 else 1.0
        EXTRA["expm_evolve100_precise_angle_err"] = float(np.linalg.norm(on - phase * tn))
        EXTRA["expm_evolve100_precise_ms_per_step"] = round(wall / steps * 1e3, 1)

    run_section("expm_evolve_precise", 240, sec_expm_evolve_precise)

    _emit()


if __name__ == "__main__":
    main()
