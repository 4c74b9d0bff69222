"""Offline simulation: would Simon-style PARTIAL reorthogonalization pay?

VERDICT (measured, round 3): NO at f32.  With honest partial dynamics
(only the selected rows' omega reset on a trigger), the trigger rate stays
at 71% (the f32 omega growth factor is ~5x/step — eps to sqrt(eps) in ~5
steps — so trigger frequency is set by arithmetic, not by reset depth) and
the unselected rows hover just under threshold, so the selected set is
~60-90% of the live rows: total row-traffic is 0.57 of the full-reset
scheme at the standard eta=eps^0.75, and only 0.48 even at eta=eps^0.6
(where semiorthogonality degrades).  A gather-based partial pass would buy
<2x on the reorth component at real accuracy cost + carry/gather
complexity — the full live-rows pass stays.  (Contrast f64, where
eps->sqrt(eps) is ~23 growth steps and partial reorth shines — the classic
PROPACK setting.)

Runs one fused Krylov build (CPU f32 semantics via numpy) on the flagship
chain to get a realistic (alpha, beta) sequence, then replays the omega
recurrence EXACTLY as `lanczos_fused._fused_stage` does (same noise model,
same sqrt(eps) trigger, same two-consecutive-steps rule), but at each
trigger also counts how many rows exceed the PARTIAL threshold
eta = eps^(3/4)  (Simon 1984: reorthogonalize against rows with
omega_j > eta, not all of them).  If the selected set is much smaller than
k, a gather-based partial pass cuts the dominant HBM traffic by k/|sel|.

Run: python experiments/omega_partial_sim.py [m_cap]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def lanczos_alpha_beta(n, m, reorth_every=1):
    """f32 chain-matrix Lanczos (full reorth, host) — realistic alpha/beta."""
    rng = np.random.default_rng(7)
    v = rng.uniform(-1, 1, n).astype(np.float32)
    v /= np.linalg.norm(v)
    basis = [v]
    alphas, betas = [], []
    u_prev = np.zeros(n, np.float32)
    beta_prev = np.float32(0)

    def matvec(x):
        y = np.zeros_like(x)
        y[:-1] += -x[1:]
        y[1:] += -x[:-1]
        return y - 4.0 * x  # offset -4, as the flagship

    u = v
    for k in range(m):
        w = matvec(u) - beta_prev * u_prev
        a = np.float32(np.dot(w, u))
        w = w - a * u
        # full reorth so alpha/beta stay the "true" sequence
        B = np.stack(basis)
        w = w - B.T @ (B @ w)
        b = np.float32(np.linalg.norm(w))
        alphas.append(a)
        betas.append(b)
        if b < 1e-12:
            break
        u_prev, beta_prev = u, b
        u = (w / b).astype(np.float32)
        basis.append(u)
    return np.array(alphas, np.float32), np.array(betas, np.float32)


def simulate(alpha, beta, eps_m=np.float32(1.1920929e-07), partial=False, eta_pow=0.75):
    """Replay the omega recurrence.  ``partial=False``: reset ALL rows on a
    trigger (what the selective engine does after its full live-rows CGS).
    ``partial=True``: reset only rows with omega > eta (what a Simon-style
    partial pass would achieve), leaving the others' omega trajectories
    untouched — the honest dynamics of a partial scheme."""
    m = len(alpha)
    thr = np.sqrt(eps_m)          # trigger threshold (code: sqrt(eps_m))
    eta = eps_m ** eta_pow        # partial-selection threshold
    omega = np.zeros(m + 1)
    omega[0] = 1.0
    omega_prev = np.zeros(m + 1)
    force = False
    force_sel = None
    triggers = 0
    sel_sizes = []
    live_at_trigger = []
    tiny = np.finfo(np.float32).tiny
    for k in range(1, m):
        a_k, b_t = alpha[k], beta[k]
        b = beta[k - 2] if k >= 2 else 0.0
        j = np.arange(m + 1)
        a_vec = np.concatenate([alpha, [0.0]])
        b_vec = np.concatenate([beta, [0.0]])
        b_jm1 = np.concatenate([[0.0], beta])
        om_p1 = np.roll(omega, -1)
        om_m1 = np.roll(omega, 1)
        noise = eps_m * (b_vec + b_t)
        w_new = (
            b_vec * om_p1 + (a_vec - a_k) * omega + b_jm1 * om_m1 - b * omega_prev
        ) / max(b_t, tiny) + noise
        w_new = np.abs(w_new)
        w_new[j == k - 1] = eps_m
        w_new[j == k] = 1.0
        w_new[j > k] = 0.0
        w_new[j <= k] = np.maximum(w_new[j <= k], eps_m)

        drift = np.max(np.where(j <= k - 2, w_new, 0.0))
        trig = (drift > thr) or force
        if trig:
            triggers += 1
            if partial:
                sel_mask = (w_new > eta) & (j <= k - 2)
                if force and force_sel is not None:
                    # the forced second pass repeats the same selected set
                    sel_mask = sel_mask | force_sel[: m + 1]
                sel_sizes.append(int(np.sum(sel_mask)))
                live_at_trigger.append(k)
                w_new[sel_mask] = eps_m
                omega_prev = omega.copy()
                omega_prev[sel_mask] = eps_m
                force_sel = sel_mask
            else:
                sel = int(np.sum((w_new > eta) & (j <= k - 2)))
                sel_sizes.append(sel)
                live_at_trigger.append(k)
                w_new[j <= k - 2] = eps_m
                omega_prev = np.full(m + 1, eps_m)
                omega_prev[j > k] = 0.0
        else:
            omega_prev = omega
            force_sel = None
        omega = w_new
        force = trig
    return triggers, np.array(sel_sizes), np.array(live_at_trigger)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = 1 << 20
    alpha, beta = lanczos_alpha_beta(n, m)
    print(f"built alpha/beta: m={len(alpha)}")
    m_eff = len(alpha) - 1
    trig0, sel0, live0 = simulate(alpha, beta, partial=False)
    base_rows = np.sum(2 * (live0 - 1))
    print(f"[full-reset] triggers: {trig0}/{m_eff} ({100*trig0/m_eff:.0f}%), total row-sweeps {base_rows}")
    for eta_pow in (0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65, 0.6):
        triggers, sel, live = simulate(alpha, beta, partial=True, eta_pow=eta_pow)
        part_rows = np.sum(2 * sel)
        print(
            f"[partial eta=eps^{eta_pow}] triggers {triggers}/{m_eff} ({100*triggers/m_eff:.0f}%), "
            f"sel mean {sel.mean():.1f} max {sel.max()}, row-sweeps {part_rows} "
            f"({part_rows/max(base_rows,1):.3f} of full-reset)"
        )


if __name__ == "__main__":
    main()
