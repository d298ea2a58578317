"""Non-WAV audio ingest through the ffmpeg-backed native codec.

The reference inherits MP3/OGG/FLAC support from aubio_source's libav
backend (/root/reference/src/fp_handler.c:604); these tests pin the
rebuild's equivalent: a mixed-format directory ingests fully, each file
self-matches, and undecodable files skip with a warning.
"""

import os

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import ContextConfig, TiresiasConfig
from tiresias_tpu.utils import native
from tiresias_tpu.utils.audio import read_audio, read_wav, synth_chirp, write_wav

SR = 8000

codec = pytest.mark.skipif(
    not native.codec_available(),
    reason="libtiresias_codec.so not built (make -C native codec)",
)


def _chirp(i: int) -> np.ndarray:
    return 0.8 * synth_chirp(200.0 + 73.0 * i, 900.0 + 41.0 * i, 2.0, SR)


@codec
class TestCodecRoundTrip:
    @pytest.mark.parametrize("ext", ["flac", "ogg", "mp3"])
    def test_encode_decode(self, tmp_path, ext):
        pcm = _chirp(1)
        path = str(tmp_path / f"tone.{ext}")
        assert native.encode_audio(path, pcm, SR)
        dec, sr = native.decode_audio(path)
        assert sr == SR
        # lossy codecs shift samples slightly; correlation over the body
        m = min(len(dec), len(pcm))
        corr = np.corrcoef(dec[500 : m - 500], pcm[500 : m - 500])[0, 1]
        assert corr > 0.95, (ext, corr)

    def test_decode_wav_matches_wav_reader(self, tmp_path):
        pcm = _chirp(2)
        path = str(tmp_path / "a.wav")
        write_wav(path, pcm, SR)
        via_codec = native.decode_audio(path)
        via_wav = read_wav(path)
        assert via_codec[1] == via_wav[1] == SR
        np.testing.assert_allclose(via_codec[0], via_wav[0], atol=1e-4)

    def test_read_audio_dispatches_by_magic(self, tmp_path):
        pcm = _chirp(3)
        flac = str(tmp_path / "a.flac")
        assert native.encode_audio(flac, pcm, SR)
        dec, sr = read_audio(flac)
        assert sr == SR and len(dec) > SR


@codec
class TestMixedFormatIngest:
    def test_mixed_directory_ingests_and_self_matches(self, tmp_path):
        directory = tmp_path / "media"
        directory.mkdir()
        files = {}
        for i, ext in enumerate(["wav", "flac", "ogg", "mp3"]):
            pcm = _chirp(10 + i)
            path = str(directory / f"clip{i}.{ext}")
            if ext == "wav":
                write_wav(path, pcm, SR)
            else:
                assert native.encode_audio(path, pcm, SR)
            files[f"clip{i}.{ext}"] = path
        # an undecodable file skips with a warning, not a sync failure
        (directory / "garbage.xyz").write_bytes(b"\x00\x01not audio\x02" * 64)

        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("media", str(directory)),),
                data_dir=str(tmp_path / "data"),
            ),
            restore=False,
        )
        report = eng.sync()
        assert report.created == 4
        assert report.failed == 1  # garbage.xyz
        names = {e.name for e in eng.get_audios("media")}
        assert names == set(files)
        # self-match: querying with the file's own (decoded) audio must hit
        # the file itself — the fingerprints are computed from the same PCM,
        # so strict mode (no truncation, 2 coefs, tight tolerance) is exact
        for name, path in files.items():
            r = eng.search_file(
                "media", path, coefs=2, tolerance=0.01, trunc_coef1=False
            )
            assert r.status == "FOUND", name
            assert r.name == name, name
        eng.close()

    def test_mulaw_wav_container_falls_back_to_codec(self, tmp_path):
        """A mu-law WAV (format tag 7) — the standard telephony container
        the reference decodes via aubio's libav backend — is a RIFF/WAVE
        file the stdlib/native PCM readers cannot parse; read_audio must
        fall through to the ffmpeg codec instead of raising wave.Error."""
        import struct

        pcm = _chirp(30)
        i16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int16)
        # G.711 mu-law encode (inline; audioop is gone in Python 3.13)
        x = i16.astype(np.int32)
        sign = np.where(x < 0, 0x80, 0)
        mag = np.minimum(np.abs(x), 32635) + 0x84
        exponent = np.floor(np.log2(mag)).astype(np.int32) - 7
        mantissa = (mag >> (exponent + 3)) & 0x0F
        ulaw = (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(
            np.uint8
        ).tobytes()
        fmt = struct.pack("<HHIIHHH", 7, 1, SR, SR, 1, 8, 0)
        path = str(tmp_path / "prompt.wav")
        with open(path, "wb") as f:
            riff_size = 4 + (8 + len(fmt)) + (8 + len(ulaw))
            f.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
            f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
            f.write(b"data" + struct.pack("<I", len(ulaw)) + ulaw)

        dec, sr = read_audio(path)
        assert sr == SR
        m = min(len(dec), len(pcm))
        corr = np.corrcoef(dec[500 : m - 500], pcm[500 : m - 500])[0, 1]
        assert corr > 0.95, corr

        # and it ingests + self-matches through the engine like any format
        directory = tmp_path / "media"
        directory.mkdir()
        os.link(path, str(directory / "prompt.wav"))
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("media", str(directory)),),
                data_dir=str(tmp_path / "data"),
            ),
            restore=False,
        )
        assert eng.sync().created == 1
        r = eng.search_file(
            "media", path, coefs=2, tolerance=0.01, trunc_coef1=False
        )
        assert (r.status, r.name) == ("FOUND", "prompt.wav")
        eng.close()

    def test_wav_only_env_skips_compressed(self, tmp_path, monkeypatch):
        """Without the codec library, non-WAV files skip-with-warning and
        WAVs still ingest (the documented degraded mode)."""
        directory = tmp_path / "media"
        directory.mkdir()
        write_wav(str(directory / "a.wav"), _chirp(20), SR)
        flac = str(directory / "b.flac")
        assert native.encode_audio(flac, _chirp(21), SR)

        monkeypatch.setattr(native, "_codec", None)
        monkeypatch.setattr(native, "_codec_tried", True)
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("media", str(directory)),),
                data_dir=str(tmp_path / "data"),
            ),
            restore=False,
        )
        report = eng.sync()
        assert report.created == 1
        assert report.failed == 1
        eng.close()
