"""Smoke-run every sample (the reference builds+runs its samples in CI)."""

import subprocess
import sys
from pathlib import Path

import pytest

SAMPLES = sorted((Path(__file__).resolve().parent.parent / "samples").glob("sample*.py"))


@pytest.mark.parametrize("sample", SAMPLES, ids=lambda p: p.stem)
def test_sample_runs(sample):
    proc = subprocess.run(
        [sys.executable, str(sample)],
        capture_output=True,
        text=True,
        timeout=600,
        env={"PATH": "/usr/bin:/bin", "LT_SAMPLE_PLATFORM": "cpu", "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert any(k in proc.stdout for k in ("Eigenvalue", "eigenvalue", "norm="))
