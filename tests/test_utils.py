"""Utility modules: tracing metrics, logging levels, uuid/hash helpers."""

import logging

import numpy as np
import pytest

from tiresias_tpu.utils.hashing import file_md5, generate_uuid
from tiresias_tpu.utils.logging import NOTICE, VERBOSE, get_logger
from tiresias_tpu.utils.tracing import Metrics, phase


class TestMetrics:
    def test_counters_and_timings(self):
        m = Metrics()
        m.add("x")
        m.add("x", 2.5)
        for v in (0.1, 0.2, 0.3, 0.4, 0.5):
            m.record_time("lat", v)
        snap = m.snapshot()
        assert snap["counters"]["x"] == 3.5
        assert len(snap["timings"]["lat"]) == 5
        assert m.percentile("lat", 50) == pytest.approx(0.3)
        assert m.percentile("lat", 100) == pytest.approx(0.5)
        assert m.percentile("missing", 50) is None

    def test_phase_records(self):
        from tiresias_tpu.utils import tracing

        before = len(tracing.metrics.snapshot()["timings"].get("test.phase", []))
        with phase("test.phase"):
            pass
        after = len(tracing.metrics.snapshot()["timings"]["test.phase"])
        assert after == before + 1

    def test_thread_safety(self):
        import threading

        m = Metrics()

        def work():
            for _ in range(500):
                m.add("n")
                m.record_time("t", 0.001)

        threads = [threading.Thread(target=work) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        snap = m.snapshot()
        assert snap["counters"]["n"] == 4000
        assert len(snap["timings"]["t"]) == 4000


class TestLogging:
    def test_custom_levels_registered(self):
        # the reference's ast_log taxonomy: NOTICE and VERBOSE exist between
        # the standard levels
        assert logging.getLevelName(NOTICE) == "NOTICE"
        assert logging.getLevelName(VERBOSE) == "VERBOSE"
        assert logging.INFO < NOTICE < logging.WARNING
        assert logging.DEBUG < VERBOSE < logging.INFO

    def test_logger_methods(self, caplog):
        log = get_logger("tiresias.test")
        with caplog.at_level(VERBOSE, logger="tiresias.test"):
            log.notice("n %d", 1)
            log.verbose("v %d", 2)
        messages = [r.getMessage() for r in caplog.records]
        assert "n 1" in messages and "v 2" in messages


class TestHashing:
    def test_uuid_format(self):
        u = generate_uuid()
        assert len(u) == 36 and u == u.lower() and u.count("-") == 4
        assert generate_uuid() != u

    def test_md5_python_fallback(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TIRESIAS_DISABLE_NATIVE", "1")
        import importlib

        from tiresias_tpu.utils import native

        # force re-evaluation of the disable flag
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_lib_tried", False)
        path = tmp_path / "f.bin"
        path.write_bytes(b"abc")
        assert file_md5(str(path)) == "900150983cd24fb0d6963f7d28e17f72"


def test_read_audio_missing_file_message(tmp_path):
    from tiresias_tpu.utils.audio import read_audio

    with pytest.raises(ValueError, match="no such file"):
        read_audio(str(tmp_path / "ghost.wav"))
