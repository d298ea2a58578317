"""Native host runtime (C++ WAV decode + MD5) vs the Python fallbacks.

The native library is optional (built with ``make -C native``); these tests
skip when it is absent. Decode semantics must match aubio_source's: int16
scaled by 1/32768, mono downmix by mean (/root/reference/src/fp_handler.c:
604,633); MD5 must produce the same lowercase hex digest as the reference's
OpenSSL path (/root/reference/src/fp_handler.c:758-805).
"""

import hashlib
import os
import wave

import numpy as np
import pytest

from tiresias_tpu.utils import native
from tiresias_tpu.utils.audio import read_wav_py, synth_tone, write_wav
from tiresias_tpu.utils.hashing import file_md5

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

SR = 8000


class TestWavDecode:
    def test_int16_matches_python(self, tmp_path):
        path = str(tmp_path / "t.wav")
        write_wav(path, synth_tone(440, 0.5, SR), SR)
        pcm_n, sr_n = native.decode_wav(path)
        pcm_p, sr_p = read_wav_py(path)
        assert sr_n == sr_p == SR
        np.testing.assert_allclose(pcm_n, pcm_p, atol=1e-7)

    def test_stereo_downmix(self, tmp_path):
        path = str(tmp_path / "st.wav")
        left = (np.sin(2 * np.pi * 300 * np.arange(4000) / SR) * 0.4 * 32767)
        right = (np.sin(2 * np.pi * 700 * np.arange(4000) / SR) * 0.4 * 32767)
        inter = np.empty(8000, dtype="<i2")
        inter[0::2] = left.astype("<i2")
        inter[1::2] = right.astype("<i2")
        with wave.open(path, "wb") as wf:
            wf.setnchannels(2)
            wf.setsampwidth(2)
            wf.setframerate(SR)
            wf.writeframes(inter.tobytes())
        pcm_n, _ = native.decode_wav(path)
        pcm_p, _ = read_wav_py(path)
        assert len(pcm_n) == 4000
        np.testing.assert_allclose(pcm_n, pcm_p, atol=1e-6)

    @pytest.mark.parametrize("sampwidth", [1, 3, 4])
    def test_other_widths(self, tmp_path, sampwidth, rng):
        path = str(tmp_path / f"w{sampwidth}.wav")
        n = 2048
        if sampwidth == 1:
            raw = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        elif sampwidth == 3:
            vals = rng.integers(-(2**23), 2**23, n)
            b = np.zeros((n, 3), np.uint8)
            v = vals & 0xFFFFFF
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            raw = b.tobytes()
        else:
            raw = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(
                "<i4"
            ).tobytes()
        with wave.open(path, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(sampwidth)
            wf.setframerate(SR)
            wf.writeframes(raw)
        pcm_n, _ = native.decode_wav(path)
        pcm_p, _ = read_wav_py(path)
        np.testing.assert_allclose(pcm_n, pcm_p, atol=1e-6)

    def test_missing_file(self):
        assert native.decode_wav("/nonexistent/x.wav") is None

    def test_garbage_file(self, tmp_path):
        path = str(tmp_path / "junk.wav")
        with open(path, "wb") as f:
            f.write(b"not a wav at all" * 10)
        assert native.decode_wav(path) is None


class TestMd5:
    def test_matches_hashlib(self, tmp_path, rng):
        path = str(tmp_path / "blob.bin")
        data = rng.bytes(1 << 20 | 12345)  # non-round size
        with open(path, "wb") as f:
            f.write(data)
        assert native.md5_file(path) == hashlib.md5(data).hexdigest()

    def test_empty_file(self, tmp_path):
        path = str(tmp_path / "empty.bin")
        open(path, "wb").close()
        assert native.md5_file(path) == hashlib.md5(b"").hexdigest()

    def test_file_md5_uses_native(self, tmp_path):
        path = str(tmp_path / "x.bin")
        with open(path, "wb") as f:
            f.write(b"hello tiresias")
        assert file_md5(path) == hashlib.md5(b"hello tiresias").hexdigest()


class TestMalformedWavs:
    """Native-parser hardening (round-3 review): hostile/quirky WAV
    headers must be rejected or clamped, never crash or misparse."""

    @staticmethod
    def _wav(fmt_payload: bytes, data: bytes, extra=b"") -> bytes:
        import struct

        body = (b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
                + (b"\x00" if len(fmt_payload) % 2 else b"")
                + extra
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    @staticmethod
    def _fmt(tag=1, ch=1, sr=8000, bits=16, trailing=b"") -> bytes:
        import struct

        block = min(ch * bits // 8, 0xFFFF)  # u16 field; the lie is fine
        return struct.pack(
            "<HHIIHH", tag, ch, sr, (sr * block) & 0xFFFFFFFF, block, bits
        ) + trailing

    def test_streaming_size_data_chunk_clamped(self, tmp_path):
        """A streaming-convention data size (0xFFFFFFFF) must clamp to
        the actual file content instead of driving a ~17 GB allocation."""
        import struct

        from tiresias_tpu.utils.native import available, decode_wav

        if not available():
            pytest.skip("native lib not built")
        samples = (np.arange(64, dtype="<i2") * 100).tobytes()
        body = (b"fmt " + struct.pack("<I", 16) + self._fmt()
                + b"data" + struct.pack("<I", 0xFFFFFFFF) + samples)
        path = tmp_path / "stream.wav"
        path.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body))
                         + b"WAVE" + body)
        decoded = decode_wav(str(path))
        assert decoded is not None
        pcm, sr = decoded
        assert sr == 8000 and len(pcm) == 64
        np.testing.assert_allclose(
            pcm, np.arange(64, dtype=np.float32) * 100 / 32768.0
        )

    def test_odd_sized_fmt_chunk_alignment(self, tmp_path):
        """An odd fmt size must skip its pad byte or every following
        chunk header is read misaligned (the data chunk vanishes)."""
        from tiresias_tpu.utils.native import available, decode_wav

        if not available():
            pytest.skip("native lib not built")
        samples = (np.arange(32, dtype="<i2") * 50).tobytes()
        path = tmp_path / "oddfmt.wav"
        path.write_bytes(self._wav(self._fmt(trailing=b"\x07"), samples))
        decoded = decode_wav(str(path))
        assert decoded is not None
        pcm, sr = decoded
        assert sr == 8000 and len(pcm) == 32

    def test_short_fmt_chunk_rejected(self, tmp_path):
        from tiresias_tpu.utils.native import available, decode_wav

        if not available():
            pytest.skip("native lib not built")
        path = tmp_path / "shortfmt.wav"
        path.write_bytes(self._wav(b"\x01\x00", b"\x00" * 8))
        assert decode_wav(str(path)) is None  # rejected, not garbage-parsed

    def test_absurd_channel_count_rejected(self, tmp_path):
        from tiresias_tpu.utils.native import available, decode_wav

        if not available():
            pytest.skip("native lib not built")
        path = tmp_path / "manych.wav"
        path.write_bytes(
            self._wav(self._fmt(ch=65535, bits=32), b"\x00" * 64)
        )
        assert decode_wav(str(path)) is None
