"""Mechanically refresh PARITY.md's measured rows (VERDICT r3 item 9).

PARITY.md is the parity ledger; its hand-maintained "measured" facts (test
count, latest driver bench metrics, multichip status, coverage) drifted from
the artifacts (r3 still said "273 tests" at 290).  This script rewrites them
from the sources of truth so the ledger cannot drift:

* test count       — ``pytest --collect-only -q`` over tests/
* bench metrics    — newest parseable BENCH_r*.json in the repo root
* multichip status — newest MULTICHIP_r*.json
* coverage         — ``--coverage "HIT/EXEC PCT GATE"`` (from a
  tools/coverage_gate.py run; optional — row kept if absent)

The generated block lives between AUTO markers; everything outside them is
hand-maintained prose.  Usage:

    python tools/refresh_parity.py [--coverage "4672/4991 93.6 92"] [--no-collect]
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PARITY = REPO / "PARITY.md"
BEGIN = "<!-- AUTO:measured (tools/refresh_parity.py — do not hand-edit) -->"
END = "<!-- AUTO:measured:end -->"


def count_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/", "-n", "0"],
        capture_output=True, text=True, cwd=REPO,
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        # "N/M tests collected" variants / summary line fallback
        m = re.search(r"collected (\d+) items", out.stdout)
    if not m:
        raise RuntimeError(f"could not parse test count from pytest output:\n{out.stdout[-500:]}")
    return int(m.group(1))


def newest_artifact(pattern: str):
    best = None
    for path in glob.glob(str(REPO / pattern)):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            doc = json.loads(Path(path).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, Path(path).name, doc)
    return best


def render_block(n_tests: int, coverage: str | None) -> str:
    lines = [BEGIN, ""]
    lines.append(f"**Test suite:** {n_tests} tests (`pytest --collect-only -q`).")
    lines.append("")

    bench = newest_artifact("BENCH_r*.json")
    if bench is not None:
        rnd, name, doc = bench
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and parsed.get("value") is not None:
            extra = parsed.get("extra", {})
            lines.append(
                f"**Latest driver bench ({name}):** {parsed['value']} {parsed.get('unit', '')} "
                f"(vs_baseline {parsed.get('vs_baseline')}).  Extra metrics recorded: "
                + ", ".join(f"`{k}`" for k in sorted(extra) if not k.endswith("_error"))
                + "."
            )
        else:
            lines.append(
                f"**Latest driver bench ({name}):** NOT parseable "
                f"(rc={doc.get('rc')}) — see BASELINE.md for builder-side measurements."
            )
        lines.append("")

    mc = newest_artifact("MULTICHIP_r*.json")
    if mc is not None:
        rnd, name, doc = mc
        ok = doc.get("ok", doc.get("parsed", {}))
        lines.append(f"**Latest multichip dryrun ({name}):** ok={ok}.")
        lines.append("")

    lines.append("| Measured fact | Value | Source |")
    lines.append("|---|---|---|")
    lines.append(f"| pytest suite size | {n_tests} | `pytest --collect-only -q` |")
    if coverage:
        hit_exec, pct, gate = coverage.split()
        lines.append(
            f"| line coverage (tools/coverage_gate.py) | {hit_exec} = {pct}% "
            f"| CI gate `--fail-under {gate}` (reference: 95% project, codecov.yml:1-8) |"
        )
    if bench is not None and isinstance(bench[2].get("parsed"), dict) and bench[2]["parsed"]:
        p = bench[2]["parsed"]
        ex = p.get("extra", {}) or {}
        for key in (
            "spmv_gbps", "stream_gbps",
            "lanczos_full_us_per_iter", "lanczos_selective_us_per_iter",
            "pv_chain256_eig_err", "pv_thick_n2p20_eig_err",
            "expm_ring100_overlap_err", "expm_ring100_angle_err",
            "expm_evolve100_angle_err", "flagship_cheby_s",
        ):
            if key in ex:
                lines.append(f"| {key} | {ex[key]} | {bench[1]} |")
    lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coverage", default=None, help='"HIT/EXEC PCT GATE", e.g. "4672/4991 93.6 92"')
    ap.add_argument("--no-collect", action="store_true", help="reuse the test count already in the AUTO block")
    args = ap.parse_args()

    text = PARITY.read_text()

    if args.no_collect:
        m = re.search(r"\*\*Test suite:\*\* (\d+) tests", text)
        if not m:
            raise SystemExit("--no-collect: no existing AUTO block to reuse")
        n_tests = int(m.group(1))
    else:
        n_tests = count_tests()

    # keep the previous coverage row when not re-measured this run
    coverage = args.coverage
    if coverage is None:
        m = re.search(r"line coverage \(tools/coverage_gate\.py\) \| (\S+) = (\S+)% \| CI gate `--fail-under (\d+)`", text)
        if m:
            coverage = f"{m.group(1)} {m.group(2)} {m.group(3)}"

    block = render_block(n_tests, coverage)
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n## Measured (auto-generated)\n\n" + block + "\n"

    # fix any hand-written stale "(N tests)" mention in the prose rows
    text = re.sub(r"tests/ \(\d+ tests\)", f"tests/ ({n_tests} tests)", text)

    PARITY.write_text(text)
    print(f"PARITY.md refreshed: {n_tests} tests; coverage={'kept' if args.coverage is None else args.coverage}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
