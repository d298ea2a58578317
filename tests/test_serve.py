"""Streaming recognition: 128 concurrent channels, batched scoring.

The BASELINE #3/#5 scenario without a PBX: synthetic 8 kHz streams pushed in
20 ms frames (Asterisk's frame size), scored in batched device passes, with
the reference's duration/hangup semantics
(/root/reference/src/application_handler.c:60,165-176).
"""

import time

import numpy as np
import pytest

from tiresias_tpu.api import STATUS_FOUND, STATUS_HANGUP, Tiresias
from tiresias_tpu.config import ContextConfig, MatchConfig, TiresiasConfig
from tiresias_tpu.serve import StreamingRecognizer
from tiresias_tpu.utils.audio import synth_tone, write_wav

SR = 8000
FRAME = SR // 50  # 20 ms


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    directory = tmp_path_factory.mktemp("serve_corpus")
    for i in range(8):
        write_wav(
            str(directory / f"tone{i}.wav"), synth_tone(300 + 200 * i, 1.0, SR), SR
        )
    cfg = TiresiasConfig(
        match=MatchConfig(coefs=2, tolerance=0.01, trunc_coef1=False),  # D8 mode
        contexts=(ContextConfig(name="media", directory=str(directory)),),
        data_dir=str(tmp_path_factory.mktemp("serve_data")),
    )
    eng = Tiresias(cfg, restore=False)
    assert eng.sync().created == 8
    return eng


class TestSingleChannel:
    def test_duration_gated_result(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("chan-1", context="media", duration_ms=1000)
        pcm = synth_tone(300, 1.2, SR)
        # push 0.5 s: not enough yet
        rec.push("chan-1", pcm[: SR // 2])
        assert rec.process_ready() == {}
        # push the rest: one result, channel closed
        rec.push("chan-1", pcm[SR // 2 :])
        results = rec.process_ready()
        assert set(results) == {"chan-1"}
        res = results["chan-1"]
        assert res.status == STATUS_FOUND and res.name == "tone0.wav"
        assert rec.n_channels == 0

    def test_hangup_before_duration(self, engine):
        # mid-record hangup → HANGUP, no search (application_handler.c:165-176)
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("chan-2", context="media", duration_ms=3000)
        rec.push("chan-2", synth_tone(500, 0.5, SR))
        res = rec.hangup("chan-2")
        assert res.status == STATUS_HANGUP
        assert res.frame_count == 0 and res.match_count == 0
        assert rec.process_ready() == {}

    def test_hangup_after_full_window_scores(self, engine):
        """A hangup racing the scorer tick must not discard a COMPLETE
        window: the reference searches once duration is reached, so a
        client that sends its last frame and immediately hangs up gets a
        real result, not HANGUP."""
        seen = {}
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open(
            "chan-h", context="media", duration_ms=1000,
            on_result=lambda cid, r: seen.setdefault(cid, r),
        )
        rec.push("chan-h", synth_tone(500, 1.0, SR))  # exactly one window
        res = rec.hangup("chan-h")  # no process_ready tick in between
        assert res.status == STATUS_FOUND and res.name == "tone1.wav"
        assert res.frame_count > 0
        assert seen["chan-h"].status == STATUS_FOUND
        assert rec.n_channels == 0 and rec.process_ready() == {}

    def test_zero_duration_uses_default(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("chan-3", context="media", duration_ms=0)
        assert rec._channels["chan-3"].duration_ms == 3000

    def test_callback_invoked(self, engine):
        seen = {}
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open(
            "chan-4", context="media", duration_ms=500,
            on_result=lambda cid, r: seen.setdefault(cid, r),
        )
        rec.push("chan-4", synth_tone(700, 0.6, SR))
        rec.process_ready()
        assert "chan-4" in seen and seen["chan-4"].name == "tone2.wav"


class TestManyChannels:
    def test_128_streams_recognized(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        n = 128
        tones = [300 + 200 * (i % 8) for i in range(n)]
        streams = [synth_tone(f, 1.1, SR) for f in tones]
        for i in range(n):
            rec.open(f"ch{i}", context="media", duration_ms=1000)
        # interleaved 20 ms frames, like a PBX would deliver
        offset = 0
        results = {}
        t0 = time.perf_counter()
        while offset < SR * 1.1:
            for i in range(n):
                rec.push(f"ch{i}", streams[i][offset : offset + FRAME])
            offset += FRAME
            results.update(rec.process_ready())
        elapsed = time.perf_counter() - t0
        assert len(results) == n
        for i in range(n):
            res = results[f"ch{i}"]
            assert res.status == STATUS_FOUND
            assert res.name == f"tone{i % 8}.wav", f"ch{i}: {res.name}"
        # loose real-time sanity: 128 x 1 s of audio in one batched pass
        # must beat 1x real time per channel even on CPU
        assert elapsed < 60.0, f"took {elapsed:.1f}s"

    def test_continuous_mode_slides(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("cont", context="media", duration_ms=250, continuous=True)
        rec.push("cont", synth_tone(300, 1.0, SR))
        first = rec.process_ready()
        assert first["cont"].status == STATUS_FOUND
        # channel stays open and a second window scores from the remainder
        assert rec.n_channels == 1
        second = rec.process_ready()
        assert second["cont"].status == STATUS_FOUND
        rec.close("cont")
        assert rec.n_channels == 0

    def test_continuous_overlapping_windows(self, engine):
        # duration 500 ms, hop 250 ms: after 1 s of audio the scorer emits
        # windows at 500/750/1000 ms — three results, not two tumbling ones
        rec = StreamingRecognizer(engine, samplerate=SR)
        seen = []
        rec.open(
            "ov", context="media", duration_ms=500, continuous=True,
            hop_ms=250, on_result=lambda cid, r: seen.append(r),
        )
        rec.push("ov", synth_tone(300, 1.0, SR))
        for _ in range(4):
            rec.process_ready()
        assert len(seen) == 3
        assert all(r.status == STATUS_FOUND and r.name == "tone0.wav"
                   for r in seen)
        rec.close("ov")

    def test_mixed_parameters_grouped(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("a", context="media", duration_ms=500)
        rec.open("b", context="media", duration_ms=500, tolerance=5.0, coefs=1)
        pcm = synth_tone(300, 0.6, SR)
        rec.push("a", pcm)
        rec.push("b", pcm)
        results = rec.process_ready()
        assert set(results) == {"a", "b"}
        assert results["a"].found


class TestInt16Streams:
    """Raw-telephony dtype handling: int16 frames stay int16 all the way
    into the engine (half the H2D bytes — the TCP wire format is int16),
    with bit-identical results to an eager float32 conversion because
    the device applies the same exact 1/32768 scaling
    (ops/mfcc_jax.py to_float_pcm)."""

    @staticmethod
    def _as_i16(pcm):
        return np.clip(pcm * 32768.0, -32768, 32767).astype(np.int16)

    def test_int16_window_reaches_engine_unconverted(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        seen_dtypes = []
        orig = engine.search_pcm_batch

        def spy(context, pcms, *a, **kw):
            seen_dtypes.extend(p.dtype for p in pcms)
            return orig(context, pcms, *a, **kw)

        engine.search_pcm_batch = spy
        try:
            rec.open("i16", context="media", duration_ms=500)
            rec.push("i16", self._as_i16(synth_tone(300, 0.6, SR)))
            results = rec.process_ready()
        finally:
            engine.search_pcm_batch = orig
        assert results["i16"].status == STATUS_FOUND
        assert results["i16"].name == "tone0.wav"
        assert seen_dtypes and all(d == np.int16 for d in seen_dtypes)

    def test_int16_matches_float32_push_exactly(self, engine):
        pcm = synth_tone(700, 0.6, SR)  # tone2
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("f32", context="media", duration_ms=500)
        rec.open("i16", context="media", duration_ms=500)
        i16 = self._as_i16(pcm)
        rec.push("f32", i16.astype(np.float32) / 32768.0)
        rec.push("i16", i16)
        results = rec.process_ready()
        a, b = results["f32"], results["i16"]
        assert a.status == b.status == STATUS_FOUND
        assert (a.name, a.match_count, a.frame_count) == (
            b.name, b.match_count, b.frame_count)

    def test_mixed_dtype_channel_promotes_with_scaling(self, engine):
        # one channel fed int16 then float32 frames: the window must
        # promote the int16 part with the 1/32768 factor, not a raw cast
        pcm = synth_tone(300, 0.6, SR)
        half = len(pcm) // 2
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("mix", context="media", duration_ms=500)
        rec.push("mix", self._as_i16(pcm[:half]))
        rec.push("mix", pcm[half:].astype(np.float32))
        results = rec.process_ready()
        assert results["mix"].status == STATUS_FOUND
        assert results["mix"].name == "tone0.wav"

    def test_int16_hangup_flush(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("hf", context="media", duration_ms=500)
        rec.push("hf", self._as_i16(synth_tone(300, 0.6, SR)))
        res = rec.hangup("hf")
        assert res is not None and res.status == STATUS_FOUND
        assert res.name == "tone0.wav"

    def test_reused_push_buffer_is_not_aliased(self, engine):
        # a caller reusing ONE writable frame buffer across pushes must not
        # alias buffered chunks to the buffer's final contents
        pcm = self._as_i16(synth_tone(300, 0.6, SR))
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("reuse", context="media", duration_ms=500)
        frame = SR // 50
        buf = np.empty(frame, np.int16)
        for off in range(0, SR // 2 + frame, frame):
            chunk = pcm[off : off + frame]
            buf[: len(chunk)] = chunk
            rec.push("reuse", buf[: len(chunk)])
        buf[:] = 0  # aliased chunks would all become silence
        results = rec.process_ready()
        assert results["reuse"].status == STATUS_FOUND
        assert results["reuse"].name == "tone0.wav"
