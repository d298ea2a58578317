"""DspConfig.samplerate semantics (VERDICT round-1 item 7).

Reference: ``DEF_AUBIO_SAMPLERATE 0`` = analyse at the file's native rate
(/root/reference/src/fp_handler.c:37,612). The rebuild's extension: a
positive ``samplerate`` forces every signal (ingest AND search) onto that
rate via polyphase resampling, so a mixed-rate corpus becomes comparable.
"""

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import ContextConfig, DspConfig, TiresiasConfig
from tiresias_tpu.utils.audio import ensure_samplerate, synth_tone, write_wav

pytest.importorskip("scipy")


class TestEnsureSamplerate:
    def test_zero_target_is_native_rate(self):
        pcm = synth_tone(440, 0.5, 16000)
        out, sr = ensure_samplerate(pcm, 16000, 0)
        assert sr == 16000 and out is pcm

    def test_matching_rate_passthrough(self):
        pcm = synth_tone(440, 0.5, 8000)
        out, sr = ensure_samplerate(pcm, 8000, 8000)
        assert sr == 8000 and out is pcm

    def test_resamples_and_scales_int16(self):
        pcm16 = (synth_tone(440, 0.5, 16000) * 32767).astype(np.int16)
        out, sr = ensure_samplerate(pcm16, 16000, 8000)
        assert sr == 8000
        assert out.dtype == np.float32
        assert abs(len(out) - 4000) <= 2
        assert np.abs(out).max() <= 1.001  # int16 was scaled before filtering


class TestEngineHonorsSamplerate:
    def test_mixed_rate_corpus_unifies(self, tmp_path):
        """A 16 kHz file ingested under samplerate=8000 must match an 8 kHz
        query of the same tone — both sides land on one analysis rate."""
        directory = tmp_path / "media"
        directory.mkdir()
        tone16k = synth_tone(440, 1.0, 16000)
        write_wav(str(directory / "tone.wav"), tone16k, 16000)
        cfg = TiresiasConfig(
            dsp=DspConfig(samplerate=8000),
            contexts=(ContextConfig("media", str(directory)),),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(cfg, restore=False)
        assert eng.sync().created == 1
        # stored fingerprint frame count reflects the 8 kHz analysis rate
        entry = eng.get_audios("media")[0]
        fp = eng.store.get_fingerprint(entry.uuid)
        assert fp.shape[0] == -(-8000 // 256)  # 1 s at 8 kHz, hop 256
        # an 8 kHz query of the same tone matches
        q = synth_tone(440, 1.0, 8000)
        r = eng.search_pcm("media", q, 8000, coefs=2, tolerance=0.05,
                           trunc_coef1=False)
        assert r.status == "FOUND"
        # a 16 kHz query is resampled to the configured rate and matches too
        r16 = eng.search_pcm("media", tone16k, 16000, coefs=2, tolerance=0.05,
                             trunc_coef1=False)
        assert r16.status == "FOUND"
        eng.close()

    def test_default_zero_keeps_native_rate(self, tmp_path):
        directory = tmp_path / "media"
        directory.mkdir()
        write_wav(str(directory / "tone.wav"), synth_tone(440, 1.0, 16000), 16000)
        cfg = TiresiasConfig(
            contexts=(ContextConfig("media", str(directory)),),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(cfg, restore=False)
        eng.sync()
        entry = eng.get_audios("media")[0]
        fp = eng.store.get_fingerprint(entry.uuid)
        assert fp.shape[0] == -(-16000 // 256)  # native 16 kHz analysis
        eng.close()

    def test_add_audio_pcm_resamples(self, tmp_path):
        cfg = TiresiasConfig(
            dsp=DspConfig(samplerate=8000),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(cfg, restore=False)
        eng.create_context("c")
        entry = eng.add_audio_pcm("c", "t", synth_tone(300, 1.0, 16000), 16000)
        fp = eng.store.get_fingerprint(entry.uuid)
        assert fp.shape[0] == -(-8000 // 256)
        eng.close()
