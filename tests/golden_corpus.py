"""Canonical deterministic corpus for the frozen DSP golden fixtures.

Shared by the fixture generator (tools/make_goldens.py) and the golden
tests. Signals are pure functions of fixed parameters/seeds so the corpus
regenerates bit-identically anywhere.
"""

from tiresias_tpu.utils.audio import synth_chirp, synth_noise, synth_tone

SR = 8000

CASES = {
    "tone_440": lambda: synth_tone(440.0, 1.7, SR),
    "tone_1000": lambda: synth_tone(1000.0, 0.5, SR),
    "chirp": lambda: synth_chirp(200.0, 3600.0, 2.0, SR),
    "noise": lambda: synth_noise(1.3, SR, seed=7),
    "speechlike": lambda: (
        synth_tone(300.0, 1.0, SR) + 0.3 * synth_tone(2200.0, 1.0, SR)
        + synth_noise(1.0, SR, amplitude=0.05, seed=3)
    ),
    "short_partial_hop": lambda: synth_tone(600.0, 0.0801, SR),
}

# one high-rate case: the mel bank layout depends on samplerate
HIGH_RATE_CASES = {
    "noise_44k": (lambda: synth_noise(0.5, 44100, seed=11), 44100),
}

# broadband signals must be float32-trustworthy almost everywhere; pure
# tones only at a minority of entries (far filters sit at the FFT noise
# floor — aubio's own float32 output is noise there too).
MIN_COVERAGE = {
    "noise": 0.95,
    "speechlike": 0.95,
    "tone_440": 0.02,
    "tone_1000": 0.05,
    "chirp": 0.02,
    "short_partial_hop": 0.02,
    "noise_44k": 0.95,
}


def all_cases():
    """{name: (make_pcm, samplerate)} over both rate groups."""
    out = {name: (fn, SR) for name, fn in CASES.items()}
    out.update(HIGH_RATE_CASES)
    return out
