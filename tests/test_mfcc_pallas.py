"""Fused Pallas MFCC kernel vs the XLA reference path.

Runs in Pallas interpret mode on CPU (tests/conftest.py forces the CPU
backend); compiled-mode equivalence on real TPU is exercised by bench.py.
The DFT-as-matmul introduces a different rounding path than jnp.fft.rfft, so
comparisons use a small absolute tolerance rather than bit equality; the
float64 golden-model parity of the whole chain is covered by
tests/test_mfcc_jax.py and the same bound applies transitively.
"""

import numpy as np
import pytest

from tiresias_tpu.config import DspConfig
from tiresias_tpu.ops.mfcc_jax import fingerprint_padded_batch, pad_frames_bucket
from tiresias_tpu.ops.mfcc_pallas import (
    fingerprint_padded_batch_pallas,
    pallas_constants,
)

SR = 8000


def _signals(rng, n=3):
    out = []
    for i in range(n):
        t = np.arange(SR // 2 + 128 * i) / SR
        sig = 0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t)
        sig += 0.05 * rng.standard_normal(len(t))
        out.append(sig.astype(np.float32))
    return out


class TestConstants:
    def test_padding_is_zero(self, dsp):
        dft_re, dft_im, mel_t, dct_t = pallas_constants(dsp, SR)
        n_bins = dsp.n_bins
        assert dft_re.shape == (512, 384) and dft_im.shape == (512, 384)
        assert (dft_re[:, n_bins:] == 0).all() and (dft_im[:, n_bins:] == 0).all()
        assert mel_t.shape == (384, 128) and (mel_t[n_bins:, :] == 0).all()
        assert (mel_t[:, dsp.n_filters:] == 0).all()
        assert dct_t.shape == (128, 128)
        assert (dct_t[dsp.n_filters:, :] == 0).all()
        assert (dct_t[:, dsp.n_coefs:] == 0).all()

    def test_windowed_dft_matches_rfft(self, dsp, rng):
        from tiresias_tpu.ops.windows import hanningz

        dft_re, dft_im, _, _ = pallas_constants(dsp, SR)
        frame = rng.standard_normal(512).astype(np.float32)
        re = frame @ dft_re[:, : dsp.n_bins]
        im = frame @ dft_im[:, : dsp.n_bins]
        mag = np.sqrt(re**2 + im**2)
        ref = np.abs(np.fft.rfft(frame * hanningz(512, dtype=np.float64)))
        np.testing.assert_allclose(mag, ref, atol=2e-3, rtol=1e-4)


class TestKernel:
    def test_matches_xla_path(self, dsp, rng):
        pcms = _signals(rng)
        padded, n_frames = pad_frames_bucket(pcms, dsp.hop_size)
        ref = np.asarray(fingerprint_padded_batch(padded, SR, dsp))
        got = np.asarray(
            fingerprint_padded_batch_pallas(padded, SR, dsp, interpret=True)
        )
        assert got.shape == ref.shape
        # valid frames only (padding frames hold log-floor noise in both)
        for i, nf in enumerate(n_frames):
            np.testing.assert_allclose(
                got[i, :nf], ref[i, :nf], atol=0.02, rtol=0
            ), f"signal {i}"

    def test_row_padding_roundtrip(self, dsp, rng):
        # a batch whose total rows are not a tile multiple
        pcm = (0.3 * rng.standard_normal((1, 37 * dsp.hop_size))).astype(
            np.float32
        )
        got = np.asarray(
            fingerprint_padded_batch_pallas(pcm, SR, dsp, interpret=True)
        )
        ref = np.asarray(fingerprint_padded_batch(pcm, SR, dsp))
        assert got.shape == (1, 37, dsp.n_coefs)
        np.testing.assert_allclose(got[0], ref[0], atol=0.02)

    def test_silence_hits_floor(self, dsp):
        pcm = np.zeros((1, 512), np.float32)
        got = np.asarray(
            fingerprint_padded_batch_pallas(pcm, SR, dsp, interpret=True)
        )
        ref = np.asarray(fingerprint_padded_batch(pcm, SR, dsp))
        np.testing.assert_allclose(got, ref, atol=1e-3)


class TestFramedKernel:
    """The in-kernel-framing variant (long signals) must match the
    frame-materialising kernel and the XLA path exactly."""

    def test_framed_path_matches_xla(self):
        from tiresias_tpu.ops.mfcc_pallas import ROW_TILE, _device_constants
        from tiresias_tpu.ops.mfcc_pallas import _fingerprint_framed

        dsp = DspConfig()
        rng = np.random.default_rng(7)
        # 2 signals x 512 frames: two full row tiles each, zero padding
        # waste -> the dispatcher would choose the framed path on TPU
        f = 2 * ROW_TILE
        s = f * dsp.hop_size
        pcm = (0.3 * rng.standard_normal((2, s))).astype(np.float32)
        consts = _device_constants(dsp, SR)
        got = np.asarray(
            _fingerprint_framed(
                pcm, *consts, dsp.hop_size, dsp.buf_size, dsp.n_coefs,
                interpret=True,
            )
        )
        ref = np.asarray(fingerprint_padded_batch(pcm, SR, dsp))
        assert got.shape == ref.shape == (2, f, dsp.n_coefs)
        np.testing.assert_allclose(got, ref, atol=0.02, rtol=0)

    def test_framed_partial_tile_and_halo(self):
        """Frame 0's pre-t0 zero halo and a partial last tile (f not a
        multiple of ROW_TILE) must both be handled."""
        from tiresias_tpu.ops.mfcc_pallas import ROW_TILE, _device_constants
        from tiresias_tpu.ops.mfcc_pallas import _fingerprint_framed

        dsp = DspConfig()
        rng = np.random.default_rng(8)
        f = ROW_TILE + 37
        s = f * dsp.hop_size
        pcm = (0.3 * rng.standard_normal((1, s))).astype(np.float32)
        consts = _device_constants(dsp, SR)
        got = np.asarray(
            _fingerprint_framed(
                pcm, *consts, dsp.hop_size, dsp.buf_size, dsp.n_coefs,
                interpret=True,
            )
        )
        ref = np.asarray(fingerprint_padded_batch(pcm, SR, dsp))
        np.testing.assert_allclose(got, ref, atol=0.02, rtol=0)

    def test_non_2x_overlap_config_stays_on_generic_path(self):
        """DSP configs whose window is not exactly two hops (legal: only
        divisibility is required) must not route to the framed kernel,
        which hard-codes 2-chunk frames."""
        dsp = DspConfig(hop_size=128, buf_size=512)
        rng = np.random.default_rng(9)
        s = 600 * dsp.hop_size  # long enough to pass the padding test
        pcm = (0.3 * rng.standard_normal((1, s))).astype(np.float32)
        got = np.asarray(
            fingerprint_padded_batch_pallas(pcm, SR, dsp, interpret=True)
        )
        ref = np.asarray(fingerprint_padded_batch(pcm, SR, dsp))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=0.02, rtol=0)
