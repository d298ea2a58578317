"""Readiness-tiered warmup (round 5, VERDICT r4 #5).

``Tiresias.warmup_async`` compiles only the serving-critical int16
bucket programs synchronously; float32 and G.711-law programs compile on
a background thread. While a law's programs are in flight the streaming
scorer host-expands wire bytes to int16 — bit-identical results (the
device uint8 table IS the int16 expansion / 32768, PARITY D18).
"""

import threading

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import TiresiasConfig
from tiresias_tpu.serve import StreamingRecognizer
from tiresias_tpu.utils import g711
from tiresias_tpu.utils.audio import float_to_i16, synth_tone

SR = 8000


@pytest.fixture
def engine(tmp_path):
    eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
    eng.create_context("c")
    for i in range(8):
        i16 = float_to_i16(synth_tone(220 + 60 * i, 3.0, SR))
        eng.add_audio_pcm("c", f"t{i}", i16.astype(np.float32) / 32768.0, SR)
    yield eng
    eng.close()


class TestWarmupAsync:
    def test_laws_not_ready_until_background_joins(self, engine,
                                                   monkeypatch):
        """During the background phase the law reads not-ready; after the
        thread finishes it reads ready. The background phase is blocked
        on an event so the not-ready window is deterministic."""
        gate = threading.Event()
        orig = engine.search_pcm_batch

        def slow_batch(context, pcms, sr, **kw):
            if kw.get("wire_law") or (
                pcms and np.asarray(pcms[0]).dtype == np.float32
            ):
                gate.wait(30)  # hold the background phase
            return orig(context, pcms, sr, **kw)

        monkeypatch.setattr(engine, "search_pcm_batch", slow_batch)
        t = engine.warmup_async(
            samplerate=SR, batch_sizes=(1, 2), laws=("ulaw",)
        )
        try:
            assert not engine.law_device_ready("ulaw")
            assert engine.law_device_ready("alaw")  # never warming
        finally:
            gate.set()
        t.join(60)
        assert not t.is_alive()
        assert engine.law_device_ready("ulaw")

    def test_background_failure_unparks_laws(self, engine, monkeypatch):
        """A crashed background warm must not leave the law host-decoding
        forever."""
        orig = engine.search_pcm_batch

        def boom(context, pcms, sr, **kw):
            if kw.get("wire_law"):
                raise RuntimeError("compile exploded")
            return orig(context, pcms, sr, **kw)

        monkeypatch.setattr(engine, "search_pcm_batch", boom)
        t = engine.warmup_async(samplerate=SR, batch_sizes=(1,),
                                laws=("alaw",))
        t.join(60)
        assert engine.law_device_ready("alaw")

    def test_default_state_is_ready(self, engine):
        assert engine.law_device_ready("ulaw")
        assert engine.law_device_ready("alaw")

    def test_overlapping_warms_keep_law_parked(self, engine,
                                               monkeypatch):
        """A second warmup_async for the same law must keep the law
        host-decoding until BOTH background phases finish — the first
        thread's cleanup must not un-park the second's registration
        (per-law counters, not a set)."""
        gates = [threading.Event(), threading.Event()]
        started = []
        orig = engine.search_pcm_batch

        def slow_batch(context, pcms, sr, **kw):
            if kw.get("wire_law"):
                i = len(started)
                started.append(i)
                gates[min(i, 1)].wait(30)
            return orig(context, pcms, sr, **kw)

        monkeypatch.setattr(engine, "search_pcm_batch", slow_batch)
        t1 = engine.warmup_async(samplerate=SR, batch_sizes=(1,),
                                 laws=("ulaw",))
        t2 = engine.warmup_async(samplerate=SR, batch_sizes=(1,),
                                 laws=("ulaw",))
        try:
            import time as _time

            assert not engine.law_device_ready("ulaw")
            gates[0].set()  # let ONE thread's law compile finish
            deadline = _time.time() + 30
            while (
                _time.time() < deadline
                and engine._laws_warming.get("ulaw", 0) > 1
            ):
                _time.sleep(0.02)
            # exactly one registration released: still parked
            assert engine._laws_warming.get("ulaw", 0) == 1
            assert not engine.law_device_ready("ulaw")
        finally:
            for g in gates:
                g.set()
        t1.join(60)
        t2.join(60)
        assert engine.law_device_ready("ulaw")


class TestScorerHostDecodeFallback:
    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_results_identical_before_and_after_warm(self, tmp_path,
                                                     monkeypatch, law):
        """A law window scored through the host-decode fallback must give
        the SAME (full self-match) result as the device-decode path.
        The store holds what the trunk delivers — compand-round-tripped
        audio — so the wire query self-matches exactly."""
        engine = Tiresias(
            TiresiasConfig(data_dir=str(tmp_path)), restore=False
        )
        engine.create_context("c")
        for i in range(8):
            i16 = float_to_i16(synth_tone(220 + 60 * i, 3.0, SR))
            trunk = g711.decode(g711.encode(i16, law), law)
            engine.add_audio_pcm("c", f"t{i}", trunk, SR)
        codes = g711.encode(_window(3), law)
        try:
            def score(ready: bool):
                monkeypatch.setattr(
                    engine, "law_device_ready", lambda L: ready
                )
                rec = StreamingRecognizer(engine, samplerate=SR)
                rec.open("ch", context="c", duration_ms=3000, law=law,
                         coefs=2, tolerance=0.01, trunc_coef1=False)
                rec.push("ch", codes)
                return rec.process_ready()["ch"]

            r_host = score(False)
            r_dev = score(True)
            assert r_host.status == r_dev.status == "FOUND"
            assert r_host.name == r_dev.name == "t3"
            assert r_host.match_count == r_dev.match_count
            assert r_host.frame_count == r_dev.frame_count
            assert r_host.match_count == r_host.frame_count  # full votes
        finally:
            engine.close()


def _window(i: int) -> np.ndarray:
    return float_to_i16(synth_tone(220 + 60 * i, 3.0, SR))
