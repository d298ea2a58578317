"""Bounded default-backend probe (utils/platform.py).

A dead tunneled-PJRT relay hangs JAX backend init forever; the driver's
bench and dry-run entry points must instead degrade to a clearly-marked
CPU fallback. These tests cover the probe's decision logic without
depending on the (environment-specific) relay state.
"""

import subprocess

from tiresias_tpu.utils import platform as plat


class TestBackendProbe:
    def test_pinned_cpu_short_circuits(self):
        # conftest pinned cpu via the config API, so no subprocess probe
        # runs at all — a 1 ms timeout would otherwise always fail
        assert plat._pinned_cpu()
        assert plat.backend_alive(timeout=0.001, attempts=1) is True

    def test_probe_timeout_is_dead(self, monkeypatch):
        monkeypatch.setattr(plat, "_pinned_cpu", lambda: False)
        calls = {"n": 0}

        def fake_run(*a, **k):
            calls["n"] += 1
            raise subprocess.TimeoutExpired(cmd="probe", timeout=k["timeout"])

        monkeypatch.setattr(subprocess, "run", fake_run)
        monkeypatch.setattr("time.sleep", lambda s: None)
        assert plat.backend_alive(timeout=0.01, attempts=2) is False
        assert calls["n"] == 2  # retried before giving up

    def test_probe_nonzero_exit_is_dead(self, monkeypatch):
        monkeypatch.setattr(plat, "_pinned_cpu", lambda: False)

        class R:
            returncode = 1

        monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
        monkeypatch.setattr("time.sleep", lambda s: None)
        assert plat.backend_alive(timeout=0.01, attempts=2) is False

    def test_probe_success_is_alive(self, monkeypatch):
        monkeypatch.setattr(plat, "_pinned_cpu", lambda: False)

        class R:
            returncode = 0

        monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
        assert plat.backend_alive(timeout=0.01, attempts=1) is True

    def test_ensure_live_backend_falls_back(self, monkeypatch):
        monkeypatch.setattr(plat, "backend_alive", lambda **k: False)
        assert plat.ensure_live_backend() == "cpu"
        import jax

        assert str(jax.config.jax_platforms).startswith("cpu")

    def test_ensure_live_backend_keeps_default(self, monkeypatch):
        monkeypatch.setattr(plat, "backend_alive", lambda **k: True)
        assert plat.ensure_live_backend() == "default"


class TestTpuSuiteStrictMode:
    """VERDICT r4 #7: a fully-skipped tests_tpu run must not read as a
    green release gate. Drives the REAL tests_tpu conftest in a
    subprocess on a CPU backend (every test skips: 'requires a real TPU
    backend') and asserts the exit code under TIRESIAS_TPU_REQUIRED."""

    def _run(self, extra_env: dict) -> subprocess.CompletedProcess:
        import os
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = os.environ.copy()
        env.pop("TIRESIAS_TPU_REQUIRED", None)
        # force the fully-skipped shape (a live axon backend would
        # otherwise run the real TPU suite here — JAX_PLATFORMS=cpu
        # alone does not defeat the plugin)
        env["_TIRESIAS_TPU_PROBE_DEAD"] = "1"
        env.update(extra_env)
        return subprocess.run(
            [sys.executable, "-m", "pytest", "tests_tpu", "-q",
             "--no-header", "-p", "no:cacheprovider", "-m", "smoke"],
            cwd=repo, env=env, text=True, timeout=240,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )

    def test_fully_skipped_run_fails_when_required(self):
        proc = self._run({"TIRESIAS_TPU_REQUIRED": "1"})
        assert proc.returncode != 0, proc.stdout[-2000:]
        assert "FAILING a fully-skipped run" in proc.stdout

    def test_fully_skipped_run_passes_by_default(self):
        proc = self._run({})
        assert proc.returncode == 0, proc.stdout[-2000:]
