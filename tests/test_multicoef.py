"""Multi-coefficient matching (extension beyond the reference's 2 coefs).

The reference stores/searches at most 2 MFCC coefficients
(/root/reference/src/fp_handler.c:39,247-250) — too few to discriminate
similar-sounding corpora. All matchers here generalize to any stored
coefficient count with plain AND semantics for coefs > 2 (the coef-2 band
quirk stays coef-2-only); the three implementations must agree exactly.
"""

import numpy as np
import pytest

from tiresias_tpu.ops import match_jax
from tiresias_tpu.ops.match_pallas import search_batch_pallas
from tiresias_tpu.ops.match_ref import search_reference
from tiresias_tpu.ops.mfcc_jax import PAD_VALUE


def _db(rng, n_audios=15, t=64, c=8):
    db = rng.uniform(-40, 30, size=(n_audios, t, c)).astype(np.float32)
    n_frames = rng.integers(1, t + 1, size=n_audios)
    mask = np.arange(t)[None, :] < n_frames[:, None]
    db = np.where(mask[:, :, None], db, PAD_VALUE).astype(np.float32)
    return db, mask, n_frames


@pytest.mark.parametrize("coefs", [3, 4, 8])
def test_xla_matches_oracle(rng, coefs):
    db, mask, n_frames = _db(rng)
    q = rng.uniform(-40, 30, size=(3, 24, 8)).astype(np.float32)
    _, _, votes = match_jax.search_batch(db, mask, q, None, coefs=coefs, tolerance=2.0)
    db_list = [db[i, : n_frames[i]] for i in range(db.shape[0])]
    for b in range(3):
        ref = search_reference(db_list, q[b], coefs=coefs, tolerance=2.0)
        np.testing.assert_array_equal(np.asarray(votes[b]), ref.votes)


@pytest.mark.parametrize("coefs", [1, 2, 4, 8])
def test_pallas_matches_xla(rng, coefs):
    db, mask, n_frames = _db(rng, n_audios=20)
    q = rng.uniform(-40, 30, size=(2, 16, 8)).astype(np.float32)
    qf = rng.integers(1, 16, size=2).astype(np.int32)
    for band in ((-1, -1), (25, 400)):
        kw = dict(coefs=coefs, tolerance=1.5,
                  freq_ignore_low=band[0], freq_ignore_high=band[1])
        _, _, votes_p = search_batch_pallas(db, q, qf, interpret=True, **kw)
        _, _, votes_x = match_jax.search_batch(db, mask, q, qf, **kw)
        np.testing.assert_array_equal(np.asarray(votes_p), np.asarray(votes_x))


def test_more_coefs_more_discriminative(rng):
    """More matched coefficients can only shrink the vote set (AND)."""
    db, mask, _ = _db(rng, n_audios=30)
    q = rng.uniform(-40, 30, size=(4, 32, 8)).astype(np.float32)
    prev = None
    for coefs in (1, 2, 4, 8):
        _, _, votes = match_jax.search_batch(
            db, mask, q, None, coefs=coefs, tolerance=3.0
        )
        votes = np.asarray(votes)
        if prev is not None:
            assert (votes <= prev).all()
        prev = votes


def test_coefs_beyond_stored_rejected(rng):
    db, mask, _ = _db(rng, c=4)
    q = rng.uniform(-40, 30, size=(1, 8, 4)).astype(np.float32)
    with pytest.raises(ValueError):
        match_jax.search_batch(db, mask, q, None, coefs=5)
