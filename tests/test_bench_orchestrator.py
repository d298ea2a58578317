"""The bench orchestrator's watchdog plumbing.

Round 3's driver bench died rc=124 with ZERO output because one stalled
XLA compile outlived the driver's timeout (BENCH_r03.json). bench.py now
runs every section in its own subprocess under a hard deadline; these
tests drive that machinery with stub sections — no device, no compiles.
"""

import importlib.util
import json
import os
import sys
import time

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
spec = importlib.util.spec_from_file_location("bench", _BENCH)
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("bench", bench)
spec.loader.exec_module(bench)


class TestRegistry:
    def test_every_secondary_section_is_registered(self):
        for name, deadline in bench.SECONDARY:
            assert name in bench.SECTIONS, name
            assert deadline >= 60

    def test_headline_ladder_sections_registered(self):
        for name in ("fingerprint", "fingerprint_reduced", "fingerprint_cpu"):
            assert name in bench.SECTIONS


class TestExtractHeadline:
    def test_finds_metric_line(self):
        out = (
            '[noise]\n{"_ctrl": 1, "key": "K", "value": 2}\n'
            '{"metric": "fingerprint_throughput", "value": 5.0}\n'
        )
        line = bench._extract_headline(out)
        assert json.loads(line)["value"] == 5.0

    def test_none_on_no_line(self):
        assert bench._extract_headline("garbage\n") is None
        assert bench._extract_headline(None) is None


class TestWatchdog:
    def test_kills_stalled_section_within_deadline(self):
        t0 = time.monotonic()
        out = bench._run_child("_test_sleep", 30, {})
        elapsed = time.monotonic() - t0
        # the child sleeps 600 s; the watchdog must kill it at ~deadline.
        # (the child still pays a few seconds of interpreter+jax import)
        assert out is None
        assert elapsed < 45

    def test_headline_section_round_trips(self):
        out = bench._run_child("_test_headline", 120, {})
        line = bench._extract_headline(out)
        assert line is not None
        assert json.loads(line)["value"] == 1234.5

    def test_control_lines_feed_state(self):
        # drive the REAL parser in _run_child with a stub section that
        # emits a control line — an inline re-implementation would keep
        # passing after the actual parsing loop regressed
        state = {}
        bench._run_child("_test_ctrl", 120, state)
        assert state["TIRESIAS_BENCH_LINK_MBS"] == 42.5

    def test_too_small_deadline_skips(self):
        assert bench._run_child("_test_sleep", 10, {}) is None

    def test_partial_output_salvaged_on_watchdog_kill(self):
        """A section that prints its headline and THEN hangs (PJRT
        teardown over a dead relay) must not lose the measurement: the
        watchdog kill drains the pipe and returns the partial output."""
        out = bench._run_child("_test_headline_then_hang", 30, {})
        line = bench._extract_headline(out)
        assert line is not None
        assert json.loads(line)["value"] == 777.0
