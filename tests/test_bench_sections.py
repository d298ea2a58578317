"""Tiny-scale CPU smokes of the driver-visible bench sections added in
round 4 (accuracy-at-distractors, prefilter fallback-regime). They run
the REAL section functions — engine API drift that would break the
driver's artifact shows up here first, not in the next round's
BENCH_r*.json."""

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
spec = importlib.util.spec_from_file_location("bench_sections", _BENCH)
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("bench_sections", bench)
spec.loader.exec_module(bench)


def test_accuracy_section_tiny(capfd):
    bench.bench_accuracy(n_tracks=64, n_queries=4, n_impostors=2)
    err = capfd.readouterr().err
    # one line per mode plus the fallback counter, printed incrementally
    assert err.count("[bench] accuracy @ 64 distractors") >= 2
    assert "prefilter ON==OFF yes" in err
    assert "certificate fallbacks" in err
    # the recommended mode must stay perfect at this trivial scale
    aligned = [
        ln for ln in err.splitlines()
        if ln.startswith("[bench] accuracy @") and "aligned@8 tol 0.1" in ln
    ][0]
    assert "top-1 clean 4/4" in aligned, aligned
    assert "false-accepts 0/2" in aligned, aligned


def test_fallback_regime_section_tiny(capfd):
    bench.bench_prefilter_fallback(n_tracks=800, t=32)
    err = capfd.readouterr().err
    lines = [
        ln for ln in err.splitlines()
        if ln.startswith("[bench] prefilter fallback-regime")
    ]
    assert len(lines) == 2, err
    for ln in lines:
        # either the designed miss/gate story or the explicit
        # not-exercised marker — never a fabricated split
        assert (
            "adaptive gate closed after query" in ln
            or "prefilter not exercised" in ln
        ), ln
