"""Offset-consistent (time-aligned) voting — the D9 extension.

Correctness is pinned against a literal numpy oracle (per-offset diagonal
sums of the hit matrix); discrimination is demonstrated on corpora where
bag-of-frames voting saturates.
"""

import numpy as np
import pytest

from tiresias_tpu.ops import match_jax
from tiresias_tpu.ops.mfcc_jax import PAD_VALUE


def _aligned_oracle(db_list, query, tolerance, coefs=1):
    """max over offsets of the aligned hit count (trunc applied to coef 1)."""
    out = []
    f_n = len(query)
    q = query.copy()
    q[:, 0] = np.trunc(q[:, 0])
    for stored in db_list:
        t_n = len(stored)
        best = 0
        for off in range(-f_n + 1, t_n):
            cnt = 0
            for f in range(f_n):
                t = f + off
                if 0 <= t < t_n:
                    if all(
                        abs(stored[t, c] - q[f, c]) <= tolerance
                        for c in range(coefs)
                    ):
                        cnt += 1
            best = max(best, cnt)
        out.append(best)
    return np.array(out)


def _db(rng, n_audios=7, t=40, c=2):
    db = rng.uniform(-40, 30, size=(n_audios, t, c)).astype(np.float32)
    n_frames = rng.integers(4, t + 1, size=n_audios)
    mask = np.arange(t)[None, :] < n_frames[:, None]
    db = np.where(mask[:, :, None], db, PAD_VALUE).astype(np.float32)
    return db, mask, n_frames


@pytest.mark.parametrize("coefs", [1, 2])
def test_matches_offset_oracle(rng, coefs):
    db, mask, n_frames = _db(rng)
    q = rng.uniform(-40, 30, size=(2, 12, 2)).astype(np.float32)
    _, _, votes = match_jax.search_batch(
        db, mask, q, None, coefs=coefs, tolerance=2.0, aligned=True
    )
    db_list = [db[i, : n_frames[i]] for i in range(db.shape[0])]
    for b in range(2):
        ref = _aligned_oracle(db_list, q[b].copy(), 2.0, coefs)
        np.testing.assert_array_equal(np.asarray(votes[b]), ref)


def test_aligned_leq_bag_of_frames(rng):
    db, mask, _ = _db(rng, n_audios=12, t=64)
    q = rng.uniform(-40, 30, size=(3, 16, 2)).astype(np.float32)
    _, _, bag = match_jax.search_batch(db, mask, q, None, tolerance=3.0)
    _, _, ali = match_jax.search_batch(
        db, mask, q, None, tolerance=3.0, aligned=True
    )
    assert (np.asarray(ali) <= np.asarray(bag)).all()


def test_discriminates_shuffled_copy(rng):
    """A frame-shuffled copy of an audio fools bag-of-frames voting (same
    value multiset) but not aligned voting (no consistent offset)."""
    base = rng.uniform(-30, 20, size=(48, 2)).astype(np.float32)
    shuffled = base[rng.permutation(48)]
    db = np.stack([base, shuffled])
    mask = np.ones((2, 48), bool)
    q = base[8:24][None]  # true excerpt of audio 0
    _, _, bag = match_jax.search_batch(db, mask, q, None, tolerance=0.01,
                                       trunc_coef1=False, coefs=2)
    _, _, ali = match_jax.search_batch(db, mask, q, None, tolerance=0.01,
                                       trunc_coef1=False, coefs=2,
                                       aligned=True)
    bag, ali = np.asarray(bag)[0], np.asarray(ali)[0]
    assert bag[0] == bag[1] == 16  # bag-of-frames cannot tell them apart
    assert ali[0] == 16 and ali[1] < 16  # alignment can


def test_engine_aligned_flag(tmp_path, rng):
    from tiresias_tpu.api import Tiresias
    from tiresias_tpu.config import TiresiasConfig
    from tiresias_tpu.utils.audio import synth_tone

    eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
    eng.create_context("c")
    eng.add_audio_pcm("c", "t", synth_tone(440, 1.0, 8000), 8000)
    r = eng.search_pcm("c", synth_tone(440, 1.0, 8000), 8000,
                       tolerance=1.0, aligned=True)
    assert r.found and r.match_count == r.frame_count
