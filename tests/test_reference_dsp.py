"""Analytic sanity tests for the NumPy golden DSP model.

These pin the aubio-derived semantics (framing, window, FFT scaling, Slaney
filterbank structure, DCT normalisation) with closed-form checks so the
golden model itself is trustworthy before the JAX/Pallas paths are validated
against it.
"""

import numpy as np
import pytest

from tiresias_tpu.config import DspConfig
from tiresias_tpu.ops import reference_dsp as rdsp
from tiresias_tpu.ops.dct import dct_matrix
from tiresias_tpu.ops.melbank import (
    SLANEY_N_FILTERS,
    mel_filterbank,
    slaney_edge_freqs,
)
from tiresias_tpu.ops.windows import hanningz
from tiresias_tpu.utils.audio import synth_tone

SR = 8000


class TestFraming:
    def test_frame_count_exact_multiple(self, dsp):
        pcm = np.zeros(dsp.hop_size * 10)
        assert rdsp.frame_signal(pcm, dsp).shape == (10, dsp.buf_size)

    def test_frame_count_partial_final_hop(self, dsp):
        pcm = np.zeros(dsp.hop_size * 10 + 1)
        assert rdsp.frame_signal(pcm, dsp).shape == (11, dsp.buf_size)

    def test_empty(self, dsp):
        assert rdsp.frame_signal(np.zeros(0), dsp).shape == (0, dsp.buf_size)

    def test_first_frame_left_zero_padded(self, dsp):
        """pvoc history starts zeroed: frame 0 = [zeros(win-hop), x[:hop]]."""
        pcm = np.arange(1, dsp.hop_size * 3 + 1, dtype=np.float64)
        frames = rdsp.frame_signal(pcm, dsp)
        lead = dsp.buf_size - dsp.hop_size
        np.testing.assert_array_equal(frames[0, :lead], 0.0)
        np.testing.assert_array_equal(frames[0, lead:], pcm[: dsp.hop_size])

    def test_frame_window_placement(self, dsp):
        """Frame f covers [(f+1)*hop - win, (f+1)*hop)."""
        pcm = np.arange(dsp.hop_size * 8, dtype=np.float64)
        frames = rdsp.frame_signal(pcm, dsp)
        f = 4
        start = (f + 1) * dsp.hop_size - dsp.buf_size
        np.testing.assert_array_equal(frames[f], pcm[start : start + dsp.buf_size])

    def test_final_partial_hop_right_zero_padded(self, dsp):
        n = dsp.hop_size * 4 + 17
        pcm = np.ones(n)
        frames = rdsp.frame_signal(pcm, dsp)
        # Last frame ends at (nf)*hop > n: tail must be zeros.
        tail = frames[-1, -(5 * dsp.hop_size - n) :]
        np.testing.assert_array_equal(tail, 0.0)


class TestWindowAndSpectrum:
    def test_hanningz_periodic(self):
        w = hanningz(512)
        assert w[0] == 0.0
        # periodic window: w[i] = 0.5(1-cos(2pi i/N)); peak at N/2
        assert w[256] == pytest.approx(1.0)
        assert np.argmax(w) == 256

    def test_tone_peaks_at_expected_bin(self, dsp):
        # 1000 Hz at 8 kHz with 512-pt FFT → bin 64 exactly.
        pcm = synth_tone(1000.0, 1.0, SR)
        mags = rdsp.magnitude_spectrum(rdsp.frame_signal(pcm, dsp), dsp)
        steady = mags[10]
        assert np.argmax(steady) == 64

    def test_fft_unnormalised_scaling(self, dsp):
        """A bin-centred unit tone through window w has peak ~ sum(w)/2."""
        pcm = np.cos(2 * np.pi * 64 * np.arange(SR) / 512.0).astype(np.float64)
        frames = rdsp.frame_signal(pcm, dsp)
        mags = rdsp.magnitude_spectrum(frames, dsp)
        w = hanningz(dsp.buf_size)
        assert mags[10, 64] == pytest.approx(w.sum() / 2.0, rel=1e-6)


class TestMelbank:
    def test_slaney_edges(self):
        freqs = slaney_edge_freqs()
        assert len(freqs) == 42
        assert freqs[0] == pytest.approx(133.3333)
        assert freqs[12] == pytest.approx(133.3333 + 12 * 66.66666666)
        # log region multiplies by 1.0711703 each step
        assert freqs[14] / freqs[13] == pytest.approx(1.0711703)

    def test_shape_and_nonneg(self, dsp):
        fb = mel_filterbank(dsp.n_filters, dsp.buf_size, SR)
        assert fb.shape == (40, 257)
        assert (fb >= 0).all()

    def test_nyquist_bin_never_assigned(self, dsp):
        """aubio's bin walk stops at n_bins-1: Nyquist column is all zero."""
        fb = mel_filterbank(dsp.n_filters, dsp.buf_size, SR)
        np.testing.assert_array_equal(fb[:, -1], 0.0)

    def test_filters_above_nyquist_are_empty(self, dsp):
        """At 8 kHz several top Slaney triangles sit past 4 kHz."""
        fb = mel_filterbank(dsp.n_filters, dsp.buf_size, SR)
        freqs = slaney_edge_freqs()
        fully_above = freqs[:SLANEY_N_FILTERS] > SR / 2
        assert fully_above.any()
        assert (fb[fully_above].sum(axis=1) == 0).all()

    def test_triangle_peak_height_unit_area(self):
        """Height 2/(upper-lower) at the center-most bin (dense FFT so a bin
        lands near each triangle's apex)."""
        sr = 44100
        fb = mel_filterbank(40, 8192, sr)
        freqs = slaney_edge_freqs()
        lower, center, upper = freqs[0], freqs[1], freqs[2]
        height = 2.0 / (upper - lower)
        assert fb[0].max() == pytest.approx(height, rel=0.25)

    def test_htk_extension_other_filter_counts(self):
        fb = mel_filterbank(26, 512, SR)
        assert fb.shape == (26, 257)
        assert (fb.sum(axis=1) > 0).sum() >= 24


class TestDct:
    def test_orthonormal_rows(self):
        full = dct_matrix(40, 40)
        gram = full @ full.T
        np.testing.assert_allclose(gram, np.eye(40), atol=1e-12)

    def test_matches_scipy_ortho(self):
        from scipy.fft import dct as scipy_dct

        x = np.random.default_rng(0).standard_normal(40)
        ours = dct_matrix(40, 40) @ x
        ref = scipy_dct(x, type=2, norm="ortho")
        np.testing.assert_allclose(ours, ref, atol=1e-12)


class TestFullChain:
    def test_shapes(self, dsp):
        pcm = synth_tone(440.0, 2.5, SR)
        fp = rdsp.fingerprint_signal(pcm, SR, dsp)
        assert fp.shape == (rdsp.n_frames_for(len(pcm), dsp.hop_size), dsp.n_coefs)
        assert np.isfinite(fp).all()

    def test_silence_is_finite(self, dsp):
        fp = rdsp.fingerprint_signal(np.zeros(SR), SR, dsp)
        assert np.isfinite(fp).all()

    def test_deterministic(self, dsp):
        pcm = synth_tone(700.0, 1.0, SR)
        a = rdsp.fingerprint_signal(pcm, SR, dsp)
        b = rdsp.fingerprint_signal(pcm, SR, dsp)
        np.testing.assert_array_equal(a, b)

    def test_distinct_signals_distinct_prints(self, dsp):
        a = rdsp.mfcc_signal(synth_tone(500.0, 1.0, SR), SR, dsp)
        b = rdsp.mfcc_signal(synth_tone(1500.0, 1.0, SR), SR, dsp)
        # raw MFCC coefficients differ clearly in steady state
        assert np.abs(a[10:20] - b[10:20]).max() > 1.0
        # and the stored 10*log10|c| values still differ (the reference's
        # log-log transform compresses but preserves distinctness)
        fa = rdsp.fingerprint_from_coefs(a)
        fb = rdsp.fingerprint_from_coefs(b)
        assert np.abs(fa[10:20] - fb[10:20]).max() > 0.05
