"""Smoke test for tools/soak.py — the committed reproduction of the
production-style TCP soak (docs/performance.md)."""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_soak_small_run_all_correct():
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "soak.py"),
            "--cpu", "--channels", "4", "--seconds", "6",
        ],
        capture_output=True, text=True, timeout=300,
        env={
            **os.environ,
            "PYTHONPATH": os.pathsep.join(
                p for p in (REPO, os.environ.get("PYTHONPATH", "")) if p
            ),
        },
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    line = [l for l in proc.stdout.splitlines() if l.startswith("soak:")][-1]
    assert "100.0% correct" in line, line
    assert "0 errors" in line, line
