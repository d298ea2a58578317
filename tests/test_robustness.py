"""Robustness: int16 staging equivalence, concurrency stress, serve error
isolation — the SURVEY.md §5 aux-subsystem checklist items the reference
delegated to SQLite's busy handler and Asterisk's threading.
"""

import threading

import numpy as np
import pytest

from tiresias_tpu.api import STATUS_NOTFOUND, Tiresias
from tiresias_tpu.config import ContextConfig, MatchConfig, TiresiasConfig
from tiresias_tpu.ops.mfcc_jax import (
    fingerprint_signals,
    pad_frames_bucket,
    to_float_pcm,
)
from tiresias_tpu.serve import StreamingRecognizer
from tiresias_tpu.store import FingerprintStore
from tiresias_tpu.utils.audio import read_wav_i16, synth_tone, write_wav

SR = 8000


class TestInt16Staging:
    def test_fingerprints_identical(self, dsp, rng):
        f32 = (0.4 * rng.standard_normal(SR)).astype(np.float32)
        i16 = np.clip(np.round(f32 * 32768.0), -32768, 32767).astype(np.int16)
        as_float = i16.astype(np.float32) / 32768.0
        fp_i, nf_i = fingerprint_signals([i16], SR, dsp)
        fp_f, nf_f = fingerprint_signals([as_float], SR, dsp)
        np.testing.assert_array_equal(nf_i, nf_f)
        np.testing.assert_array_equal(fp_i, fp_f)  # bit-exact

    def test_pad_keeps_int16(self, dsp, rng):
        i16 = [rng.integers(-100, 100, SR // 4).astype(np.int16)] * 2
        padded, _ = pad_frames_bucket(i16, dsp.hop_size)
        assert padded.dtype == np.int16
        mixed = [i16[0], np.zeros(10, np.float32)]
        padded2, _ = pad_frames_bucket(mixed, dsp.hop_size)
        assert padded2.dtype == np.float32

    def test_read_wav_i16(self, tmp_path):
        path = str(tmp_path / "a.wav")
        write_wav(path, synth_tone(440, 0.2, SR), SR)
        out = read_wav_i16(path)
        assert out is not None
        pcm, sr = out
        assert pcm.dtype == np.int16 and sr == SR
        assert read_wav_i16(str(tmp_path / "missing.wav")) is None

    def test_to_float_passthrough(self):
        import jax.numpy as jnp

        x = jnp.asarray(np.array([16384, -32768], np.int16))
        np.testing.assert_allclose(np.asarray(to_float_pcm(x)), [0.5, -1.0])
        y = jnp.asarray(np.array([0.25], np.float32))
        np.testing.assert_array_equal(np.asarray(to_float_pcm(y)), [0.25])


class TestIngestResilience:
    def test_corrupt_file_skipped_others_ingested(self, tmp_path):
        """Per-file continue on decode failure
        (/root/reference/src/app_tiresias.c:415-419)."""
        from tiresias_tpu.config import ContextConfig, TiresiasConfig

        directory = tmp_path / "c"
        directory.mkdir()
        write_wav(str(directory / "good.wav"), synth_tone(440, 0.5, SR), SR)
        (directory / "junk.wav").write_bytes(b"definitely not a wav" * 100)
        (directory / "empty.wav").write_bytes(b"")
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("c", str(directory)),),
                data_dir=str(tmp_path / "d"),
            ),
            restore=False,
        )
        report = eng.sync()
        assert report.created == 1 and report.failed == 2
        assert [a.name for a in eng.get_audios("c")] == ["good.wav"]


class TestAdversarialAudio:
    def test_nonfinite_float_wav_rejected(self, tmp_path):
        import struct
        import wave

        from tiresias_tpu.config import ContextConfig, TiresiasConfig

        directory = tmp_path / "c"
        directory.mkdir()
        # hand-build a float32 WAV full of NaNs (format tag 3)
        n = 4000
        data = struct.pack(f"<{n}f", *([float("nan")] * n))
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, SR, SR * 4, 4, 32)
            + b"data" + struct.pack("<I", len(data))
        )
        (directory / "nan.wav").write_bytes(hdr + data)
        write_wav(str(directory / "ok.wav"), synth_tone(440, 0.5, SR), SR)
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("c", str(directory)),),
                data_dir=str(tmp_path / "d"),
            ),
            restore=False,
        )
        report = eng.sync()
        assert report.created == 1 and report.failed == 1
        assert [a.name for a in eng.get_audios("c")] == ["ok.wav"]

    def test_chain_stays_finite_on_extremes(self, dsp):
        for pcm in (
            np.ones(SR // 2, np.float32),  # hard-clipped
            np.full(SR // 2, 1e30, np.float32),  # absurd amplitude
            np.zeros(SR // 2, np.float32),  # silence
        ):
            fp, _ = fingerprint_signals([pcm], SR, dsp)
            assert np.isfinite(np.asarray(fp)).all()


class TestResample:
    def test_round_trip_tone(self):
        from tiresias_tpu.utils.audio import resample_poly

        tone16 = synth_tone(440, 0.25, 16000)
        down = resample_poly(tone16, 16000, 8000)
        assert len(down) == len(tone16) // 2
        # energy preserved within a few percent
        e_in = np.mean(tone16.astype(np.float64) ** 2)
        e_out = np.mean(down.astype(np.float64) ** 2)
        assert abs(e_out - e_in) / e_in < 0.05
        same = resample_poly(tone16, 16000, 16000)
        np.testing.assert_array_equal(same, tone16)


class TestStoreConcurrency:
    def test_parallel_mutation_and_read(self, rng):
        """The reference absorbs cross-thread contention with SQLite's busy
        handler (db_ctx_handler.c:122-140); the store's lock must survive the
        same access pattern without corruption."""
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        errors = []

        def writer(k):
            try:
                for i in range(30):
                    fp = rng.uniform(-30, 20, size=(10, 2)).astype(np.float32)
                    e = store.add_audio(f"w{k}-{i}", "c", fp, f"h{k}-{i}")
                    if i % 3 == 0 and e is not None:
                        store.delete_audio(e.uuid)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        def reader():
            try:
                for _ in range(60):
                    store.get_audios_by_context("c")
                    store.host_db()
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=writer, args=(k,)) for k in range(4)]
        threads += [threading.Thread(target=reader) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        # catalog/matrix consistency: every entry's fingerprint is readable
        assert len(store) == 4 * 20  # 30 adds − 10 deletes per writer
        for e in store.iter_entries():
            assert store.get_fingerprint(e.uuid).shape == (10, 2)


class TestServeErrorIsolation:
    def test_failing_group_degrades_to_notfound(self, tmp_path):
        directory = tmp_path / "c"
        directory.mkdir()
        write_wav(str(directory / "a.wav"), synth_tone(440, 0.5, SR), SR)
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("c", str(directory)),),
                data_dir=str(tmp_path / "d"),
            ),
            restore=False,
        )
        eng.sync()
        rec = StreamingRecognizer(eng, samplerate=SR)
        seen = {}
        # bad params now raise at open() time (ADVICE #3), so inject the
        # failure inside the shared scorer instead: the "bad" channel's
        # distinct tolerance isolates it in its own search group, and the
        # patched engine raises for exactly that group.
        real_search = eng.search_pcm_batch

        def flaky_search(context, pcms, samplerate, **kw):
            if kw.get("tolerance") == 123.0:
                raise RuntimeError("injected search failure")
            return real_search(context, pcms, samplerate, **kw)

        eng.search_pcm_batch = flaky_search
        rec.open(
            "bad", context="c", duration_ms=200, tolerance=123.0,
            on_result=lambda cid, r: seen.setdefault(cid, r),
        )
        rec.open(
            "good", context="c", duration_ms=200,
            on_result=lambda cid, r: seen.setdefault(cid, r),
        )
        pcm = synth_tone(440, 0.3, SR)
        rec.push("bad", pcm)
        rec.push("good", pcm)
        results = rec.process_ready()
        assert results["bad"].status == STATUS_NOTFOUND
        assert results["good"].frame_count > 0  # unaffected group
        assert seen["bad"].status == STATUS_NOTFOUND
