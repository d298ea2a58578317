"""Lattice matcher: exactness vs the Python oracle and the generic matcher.

The lattice path must be bit-exact with reference semantics for the
dialplan configuration (coefs=1, truncated query) across tolerances and
band filters — it is the production search path for the <10 ms p50 target.
"""

import numpy as np
import pytest

from tiresias_tpu.ops import match_jax
from tiresias_tpu.ops.match_lattice import (
    K_MIN,
    K_SIZE,
    build_value_map,
    search_lattice,
)
from tiresias_tpu.ops.match_ref import search_reference
from tiresias_tpu.ops.mfcc_jax import PAD_VALUE


def _random_db(rng, n_audios=23, t=64, c=2, lo=-40.0, hi=30.0):
    db = rng.uniform(lo, hi, size=(n_audios, t, c)).astype(np.float32)
    n_frames = rng.integers(1, t + 1, size=n_audios)
    mask = np.arange(t)[None, :] < n_frames[:, None]
    db = np.where(mask[:, :, None], db, PAD_VALUE).astype(np.float32)
    return db, mask, n_frames


def _db_as_list(db, n_frames):
    return [db[i, : n_frames[i]] for i in range(db.shape[0])]


@pytest.mark.parametrize("tolerance", [0.001, 0.3, 1.0, 2.5])
def test_matches_oracle(rng, tolerance):
    db, mask, n_frames = _random_db(rng)
    vmap_ = build_value_map(db[..., 0], mask)
    q = rng.uniform(-40, 30, size=(4, 32, 2)).astype(np.float32)
    best, count, votes = search_lattice(vmap_, q, tolerance=tolerance)
    db_list = _db_as_list(db, n_frames)
    for b in range(q.shape[0]):
        ref = search_reference(db_list, q[b], coefs=1, tolerance=tolerance)
        np.testing.assert_array_equal(np.asarray(votes[b]), ref.votes)


@pytest.mark.parametrize("band", [(-1, -1), (30, -1), (-1, 250), (20, 400)])
def test_band_filter_matches_oracle(rng, band):
    lo, hi = band
    db, mask, n_frames = _random_db(rng, n_audios=11)
    vmap_ = build_value_map(db[..., 0], mask)
    q = rng.uniform(-40, 30, size=(3, 24, 2)).astype(np.float32)
    best, count, votes = search_lattice(
        vmap_, q, tolerance=0.8, freq_ignore_low=lo, freq_ignore_high=hi
    )
    db_list = _db_as_list(db, n_frames)
    for b in range(q.shape[0]):
        ref = search_reference(
            db_list, q[b], coefs=1, tolerance=0.8,
            freq_ignore_low=lo, freq_ignore_high=hi,
        )
        np.testing.assert_array_equal(np.asarray(votes[b]), ref.votes)
        exp_best = -1 if ref.best_index is None else ref.best_index
        assert int(best[b]) == exp_best
        assert int(count[b]) == ref.match_count


def test_matches_generic_matcher(rng):
    db, mask, n_frames = _random_db(rng, n_audios=50, t=96)
    vmap_ = build_value_map(db[..., 0], mask)
    q = rng.uniform(-40, 30, size=(6, 48, 2)).astype(np.float32)
    q_frames = rng.integers(1, 48, size=6).astype(np.int32)
    for tol in (0.001, 0.9):
        _, _, votes_l = search_lattice(vmap_, q, q_frames, tolerance=tol)
        _, _, votes_g = match_jax.search_batch(
            db, mask, q, q_frames, coefs=1, tolerance=tol
        )
        np.testing.assert_array_equal(np.asarray(votes_l), np.asarray(votes_g))


def test_floor_values_in_lattice(rng):
    # the PARITY.md D1 floor (≈ -417) must be inside the lattice range
    assert K_MIN <= -418 and K_MIN + K_SIZE > 45
    db, mask, n_frames = _random_db(rng, n_audios=5, lo=-417.0, hi=-400.0)
    vmap_ = build_value_map(db[..., 0], mask)
    q = rng.uniform(-417, -400, size=(2, 16, 2)).astype(np.float32)
    _, _, votes = search_lattice(vmap_, q, tolerance=1.0)
    db_list = _db_as_list(db, n_frames)
    for b in range(2):
        ref = search_reference(db_list, q[b], coefs=1, tolerance=1.0)
        np.testing.assert_array_equal(np.asarray(votes[b]), ref.votes)


def test_empty_audio_never_votes(rng):
    db, mask, n_frames = _random_db(rng, n_audios=4)
    mask[2, :] = False  # audio 2 has no valid frames
    vmap_ = build_value_map(db[..., 0], mask)
    q = rng.uniform(-40, 30, size=(2, 16, 2)).astype(np.float32)
    _, _, votes = search_lattice(vmap_, q, tolerance=5.0)
    assert (np.asarray(votes)[:, 2] == 0).all()


def test_negative_tolerance_default(rng):
    db, mask, n_frames = _random_db(rng)
    vmap_ = build_value_map(db[..., 0], mask)
    q = rng.uniform(-40, 30, size=(1, 8, 2)).astype(np.float32)
    _, _, v_neg = search_lattice(vmap_, q, tolerance=-1.0)
    _, _, v_def = search_lattice(vmap_, q, tolerance=0.001)
    np.testing.assert_array_equal(np.asarray(v_neg), np.asarray(v_def))


class TestDistanceTransformBuild:
    """The O(A·(T+K)) distance-transform value-map build must be bitwise
    identical to the brute-force min_t |fl(v - k)| it replaced."""

    @staticmethod
    def _brute_force(db0, db_mask, k_min, k_size):
        import jax.numpy as jnp

        d = jnp.where(db_mask, db0, jnp.inf)
        ks = jnp.arange(k_min, k_min + k_size, dtype=jnp.float32)
        out = []
        for start in range(0, k_size, 64):
            kb = ks[start : start + 64]
            out.append(jnp.min(jnp.abs(d[:, :, None] - kb[None, None, :]), axis=1))
        return jnp.concatenate(out, axis=1)

    def test_bitwise_vs_brute_force(self):
        import jax.numpy as jnp

        from tiresias_tpu.ops.match_lattice import K_MIN, K_SIZE, build_value_map

        rng = np.random.default_rng(42)
        a, t = 12, 96
        # realistic values + extremes beyond the lattice + exact integers
        db = rng.uniform(-460.0, 60.0, size=(a, t)).astype(np.float32)
        db[0, :4] = [-600.0, 300.0, -512.0, 127.0]
        db[1, :3] = [0.0, -1.0, 25.0]
        mask = rng.random((a, t)) > 0.2
        mask[2] = False  # an audio with no live frames
        fast = np.asarray(build_value_map(jnp.asarray(db), jnp.asarray(mask)))
        slow = np.asarray(
            self._brute_force(jnp.asarray(db), jnp.asarray(mask), K_MIN, K_SIZE)
        )
        np.testing.assert_array_equal(fast, slow)


def test_chunked_build_matches_single_block(monkeypatch):
    """The fixed-chunk build (one compile for any DB size) must be bitwise
    identical to a single whole-array block, including the padded tail."""
    import jax.numpy as jnp

    from tiresias_tpu.ops import match_lattice as ml

    rng = np.random.default_rng(11)
    a, t = 150, 64  # not a multiple of the chunk -> exercises tail padding
    db = rng.uniform(-40, 30, size=(a, t)).astype(np.float32)
    nf = rng.integers(1, t, size=a)
    mask = np.arange(t)[None, :] < nf[:, None]
    db = np.where(mask, db, -1e6).astype(np.float32)

    whole = np.asarray(
        ml._build_value_map_block(jnp.asarray(db), jnp.asarray(mask))
    )
    monkeypatch.setattr(ml, "_BUILD_CHUNK", 64)
    chunked = np.asarray(ml.build_value_map(jnp.asarray(db), jnp.asarray(mask)))
    np.testing.assert_array_equal(whole, chunked)
