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


def test_soak_with_live_mutation_and_mem_trend():
    """--mutate runs the admin-plane mutator (sync ingest / remove / save /
    compact against the live store) while the fleet recognizes; the
    summary must count mutations, stay 100% correct, and the memory
    sampler must report a flat trend (VERDICT r3 item 8)."""
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "soak.py"),
            "--cpu", "--channels", "4", "--seconds", "12",
            "--mutate", "--mutate-period", "3",
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
    assert "100.0% correct" in line and "0 errors" in line, line
    assert "live mutations" in line, line
    # at least one sync+remove cycle landed
    n_mut = int(line.split(" live mutations")[0].rsplit(" ", 1)[-1])
    assert n_mut >= 2, line
    mem = [l for l in proc.stdout.splitlines() if l.startswith("soak-mem:")]
    assert mem and "flat" in mem[-1], mem
