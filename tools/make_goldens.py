"""Generate the frozen DSP golden fixtures (tests/goldens/mfcc_goldens.npz).

Run ONCE (and only deliberately) from the repo root:

    python tools/make_goldens.py

The fixture freezes every sub-stage of the float64 oracle
(tiresias_tpu/ops/reference_dsp.py) over the canonical corpus
(tests/golden_corpus.py): |FFT| magnitudes, mel energies, log-mel, DCT
coefficients and the final 10*log10|c| fingerprint — the stages of the
reference chain at /root/reference/src/fp_handler.c:632-661.

Tests compare all live DSP paths against the *file*, not the live oracle,
so a silent edit to reference_dsp.py can no longer re-baseline everything
unnoticed (the oracle itself is checked against the fixture too).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_corpus import all_cases  # noqa: E402

from tiresias_tpu.config import DspConfig  # noqa: E402
from tiresias_tpu.ops import reference_dsp as rdsp  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "goldens", "mfcc_goldens.npz"
)


def main() -> None:
    dsp = DspConfig()
    arrays: dict[str, np.ndarray] = {"__version__": np.int64(1)}
    for name, (make_pcm, sr) in sorted(all_cases().items()):
        pcm = np.asarray(make_pcm(), dtype=np.float64)
        frames = rdsp.frame_signal(pcm, dsp)
        mags = rdsp.magnitude_spectrum(frames, dsp)
        mels = rdsp.mel_energies(mags, dsp, sr)
        logm = rdsp.log_mel(mels)
        coefs = rdsp.mfcc(logm, dsp)
        fp = rdsp.fingerprint_from_coefs(coefs)
        arrays[f"{name}/samplerate"] = np.int64(sr)
        arrays[f"{name}/mags"] = mags
        arrays[f"{name}/mels"] = mels
        arrays[f"{name}/logmel"] = logm
        arrays[f"{name}/coefs"] = coefs
        arrays[f"{name}/fp"] = fp
        print(f"{name}: sr={sr} frames={fp.shape[0]}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {os.path.abspath(OUT)} "
          f"({os.path.getsize(OUT) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
