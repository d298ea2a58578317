"""Matcher parity: JAX matcher vs the pure-Python SQL-semantics oracle.

Covers every semantic quirk catalogued in PARITY.md §3: int truncation of
max1, band filter in the log domain (frame drop for max1, condition drop for
max2), inclusive tolerance bands, one-vote-per-frame-per-audio capping,
top-1 with counts, negative tolerance defaulting, coefs validation.
"""

import numpy as np
import pytest

from tiresias_tpu.config import DEF_SEARCH_TOLERANCE
from tiresias_tpu.ops import match_jax
from tiresias_tpu.ops.match_ref import search_reference


def make_db(rng, n_audios=12, t_range=(5, 60), loc=20.0, scale=3.0):
    """Random DB in a realistic fingerprint value range (max1 ≈ 20)."""
    db = []
    for _ in range(n_audios):
        t = int(rng.integers(*t_range))
        db.append(
            np.stack(
                [rng.normal(loc, scale, t), rng.normal(loc - 4, scale, t)], axis=1
            ).astype(np.float64)
        )
    return db


def pack_db(db):
    """list-of-[T,2] → padded [A,T,2] float32 + mask."""
    a = len(db)
    tmax = max((len(d) for d in db), default=1)
    packed = np.full((a, max(tmax, 1), 2), -1e6, dtype=np.float32)
    mask = np.zeros((a, max(tmax, 1)), dtype=bool)
    for i, d in enumerate(db):
        packed[i, : len(d)] = d
        mask[i, : len(d)] = True
    return packed, mask


def run_both(db, query, **kw):
    ref = search_reference(db, query, **kw)
    packed, mask = pack_db(db)
    best, count, votes = match_jax.search_batch(
        packed, mask, query[None].astype(np.float32), None,
        coefs=kw.get("coefs", 1),
        tolerance=kw.get("tolerance", DEF_SEARCH_TOLERANCE),
        freq_ignore_low=kw.get("freq_ignore_low", -1),
        freq_ignore_high=kw.get("freq_ignore_high", -1),
    )
    return ref, int(best[0]), int(count[0]), np.asarray(votes[0])


@pytest.mark.parametrize("coefs", [1, 2])
@pytest.mark.parametrize("tolerance", [0.001, 0.3, 1.5])
def test_random_cross_validation(rng, coefs, tolerance):
    for trial in range(8):
        db = make_db(rng)
        query = np.stack(
            [rng.normal(20.0, 3.0, 30), rng.normal(16.0, 3.0, 30)], axis=1
        )
        ref, best, count, votes = run_both(db, query, coefs=coefs, tolerance=tolerance)
        np.testing.assert_array_equal(votes, ref.votes)
        assert count == ref.match_count
        assert best == (-1 if ref.best_index is None else ref.best_index)


@pytest.mark.parametrize("lo,hi", [(10, -1), (-1, 200), (10, 200), (80, 120)])
def test_band_filter_cross_validation(rng, lo, hi):
    for coefs in (1, 2):
        db = make_db(rng, loc=12.0, scale=6.0)
        query = np.stack(
            [rng.normal(12.0, 6.0, 40), rng.normal(10.0, 6.0, 40)], axis=1
        )
        ref, best, count, votes = run_both(
            db, query, coefs=coefs, tolerance=1.0,
            freq_ignore_low=lo, freq_ignore_high=hi,
        )
        np.testing.assert_array_equal(votes, ref.votes)
        assert (best, count) == (
            -1 if ref.best_index is None else ref.best_index,
            ref.match_count,
        )


class TestQuirks:
    def test_int_truncation_toward_zero(self):
        """(int)(-3.7) == -3 in C; DB value must match the truncated query."""
        db = [np.array([[-3.0, 0.0]]), np.array([[-3.7, 0.0]])]
        query = np.array([[-3.7, 0.0]])
        ref, best, count, votes = run_both(db, query, tolerance=0.001)
        # query truncates to -3.0 → matches audio 0, not the raw -3.7
        assert list(votes) == [1, 0] and best == 0
        assert list(ref.votes) == [1, 0]

    def test_positive_truncation(self):
        db = [np.array([[20.0, 0.0]]), np.array([[20.9, 0.0]])]
        query = np.array([[20.9, 0.0]])
        _, best, _, votes = run_both(db, query, tolerance=0.001)
        assert list(votes) == [1, 0] and best == 0

    def test_one_vote_per_frame_per_audio(self):
        """An audio with many in-band frames still gets 1 vote per query frame."""
        db = [np.tile(np.array([[20.0, 0.0]]), (50, 1))]
        query = np.tile(np.array([[20.0, 0.0]]), (3, 1))
        ref, best, count, votes = run_both(db, query, tolerance=0.5)
        assert votes[0] == 3 == ref.votes[0]
        assert ref.frame_count == 3

    def test_inclusive_band_edges(self):
        db = [np.array([[21.0, 0.0]])]
        query = np.array([[20.0, 0.0]])
        _, _, count, votes = run_both(db, query, tolerance=1.0)
        assert votes[0] == 1  # 21.0 == 20.0 + tol exactly → included

    def test_frame_skipped_when_max1_below_low_band(self):
        # 10*log10(100) = 20; truncated query 19 < 20 → frame skipped
        db = [np.array([[19.0, 0.0]])]
        query = np.array([[19.4, 0.0]])
        ref, best, count, votes = run_both(
            db, query, tolerance=1.0, freq_ignore_low=100
        )
        assert votes[0] == 0 and best == -1
        assert ref.frame_count == 1  # skipped frames still count

    def test_frame_skipped_when_max1_above_high_band(self):
        db = [np.array([[25.0, 0.0]])]
        query = np.array([[25.0, 0.0]])
        _, best, _, votes = run_both(db, query, tolerance=1.0, freq_ignore_high=100)
        assert votes[0] == 0 and best == -1

    def test_max2_out_of_band_drops_condition_not_frame(self):
        """Reference quirk PARITY.md §3.3: frame still votes on max1 alone."""
        # max2 of query = 5 < 10*log10(100)=20 → max2 condition dropped.
        # DB max2 (99) would NOT match the query's max2 (5), so a vote proves
        # the condition was dropped rather than the frame skipped.
        db = [np.array([[25.0, 99.0]])]
        query = np.array([[25.0, 5.0]])
        ref, best, count, votes = run_both(
            db, query, coefs=2, tolerance=1.0, freq_ignore_low=100, freq_ignore_high=10000
        )
        assert votes[0] == 1 and best == 0
        assert ref.votes[0] == 1

    def test_max2_in_band_is_enforced(self):
        db = [np.array([[25.0, 99.0]])]
        query = np.array([[25.0, 25.0]])  # in band [20, 40]
        ref, best, count, votes = run_both(
            db, query, coefs=2, tolerance=1.0, freq_ignore_low=100, freq_ignore_high=10000
        )
        assert votes[0] == 0 and best == -1

    def test_negative_tolerance_defaults(self):
        db = [np.array([[20.0, 0.0]])]
        query = np.array([[20.0005, 0.0]])  # trunc → 20.0; default tol 0.001
        ref, best, count, votes = run_both(db, query, tolerance=-5.0)
        assert votes[0] == 1 and best == 0

    def test_coefs_validation(self):
        db = [np.array([[20.0, 0.0]])]
        with pytest.raises(ValueError):
            search_reference(db, np.array([[20.0, 0.0]]), coefs=3)

    def test_tiebreak_lowest_index(self):
        db = [np.array([[20.0, 0.0]]), np.array([[20.0, 0.0]])]
        query = np.array([[20.0, 0.0]])
        ref, best, count, votes = run_both(db, query, tolerance=0.5)
        assert list(votes) == [1, 1]
        assert best == 0 == ref.best_index

    def test_not_found(self):
        db = [np.array([[20.0, 0.0]])]
        query = np.array([[90.0, 0.0]])
        ref, best, count, votes = run_both(db, query, tolerance=0.5)
        assert best == -1 and count == 0 and ref.best_index is None


class TestBatchedAndFiltered:
    def test_batch_matches_singles(self, rng):
        db = make_db(rng, n_audios=9)
        packed, mask = pack_db(db)
        queries = [
            np.stack([rng.normal(20, 3, 25), rng.normal(16, 3, 25)], 1)
            for _ in range(4)
        ]
        qarr = np.stack(queries).astype(np.float32)
        best_b, count_b, votes_b = match_jax.search_batch(
            packed, mask, qarr, None, coefs=2, tolerance=1.0
        )
        for i, q in enumerate(queries):
            ref = search_reference(db, q, coefs=2, tolerance=1.0)
            np.testing.assert_array_equal(np.asarray(votes_b[i]), ref.votes)

    def test_ragged_query_batch_masking(self, rng):
        db = make_db(rng, n_audios=5)
        packed, mask = pack_db(db)
        q_long = np.stack([rng.normal(20, 3, 30), rng.normal(16, 3, 30)], 1)
        q_short = q_long[:12]
        qarr = np.stack([q_long, np.pad(q_short, ((0, 18), (0, 0)))]).astype(np.float32)
        n_frames = np.array([30, 12], dtype=np.int32)
        _, _, votes = match_jax.search_batch(packed, mask, qarr, n_frames, tolerance=1.0)
        ref_short = search_reference(db, q_short, tolerance=1.0)
        np.testing.assert_array_equal(np.asarray(votes[1]), ref_short.votes)

    def test_audio_filter(self, rng):
        db = [np.array([[20.0, 0.0]]), np.array([[20.0, 0.0]])]
        packed, mask = pack_db(db)
        query = np.array([[[20.0, 0.0]]], dtype=np.float32)
        import jax.numpy as jnp

        best, count, _ = match_jax.search_batch(
            packed, mask, query, None, tolerance=0.5,
            audio_filter=jnp.array([False, True]),
        )
        assert int(best[0]) == 1

    def test_audio_block_padding(self, rng):
        """A not a multiple of the block size: padding audios never vote."""
        db = make_db(rng, n_audios=3)
        packed, mask = pack_db(db)
        query = np.stack([rng.normal(20, 3, 10), rng.normal(16, 3, 10)], 1)
        ref = search_reference(db, query, tolerance=2.0)
        _, _, votes = match_jax.search_batch(
            packed, mask, query[None].astype(np.float32), None, tolerance=2.0
        )
        assert votes.shape == (1, 3)
        np.testing.assert_array_equal(np.asarray(votes[0]), ref.votes)


class TestFusedFastPathEquivalence:
    """The single-dispatch fused dialplan search must return exactly what
    the staged path returns — same winner (D5 tiebreak included), same
    counts — on corpora engineered to produce vote ties."""

    def test_fused_equals_staged(self, tmp_path):
        import numpy as np

        from tiresias_tpu.api import Tiresias
        from tiresias_tpu.config import TiresiasConfig
        from tiresias_tpu.utils.audio import synth_tone

        SR = 8000
        eng = Tiresias(
            TiresiasConfig(data_dir=str(tmp_path / "d")), restore=False
        )
        eng.create_context("c")
        rng = np.random.default_rng(5)
        # duplicate fingerprints guarantee exact vote ties -> tiebreak matters
        base = rng.uniform(-30, 25, size=(64, 2)).astype(np.float32)
        for i in range(6):
            fp = base if i % 2 == 0 else rng.uniform(
                -30, 25, size=(64, 2)).astype(np.float32)
            eng.store.add_audio(f"t{i}", "c", fp, f"h{i}", dedupe=False)
        queries = [synth_tone(300 + 90 * i, 1.0, SR) for i in range(4)]

        fused = eng.search_pcm_batch("c", queries, SR, tolerance=5.0)
        assert eng._fused_search_batch(
            "c", queries, SR, None, 5.0, -1, -1, False, None, None
        ) is not None  # the default config really takes the fast path
        # force the staged path by disabling the fused one
        orig = eng._fused_search_batch
        eng._fused_search_batch = lambda *a, **k: None
        try:
            staged = eng.search_pcm_batch("c", queries, SR, tolerance=5.0)
        finally:
            eng._fused_search_batch = orig
        for f, s in zip(fused, staged):
            assert (f.status, f.uuid, f.match_count, f.frame_count) == (
                s.status, s.uuid, s.match_count, s.frame_count)
        eng.close()

    def test_fused_serves_context_filtered_search(self, tmp_path):
        """filter_context stays on the fused single-dispatch path (the
        view's ctx-id array zeros out-of-context votes on device) and
        equals the staged path exactly — including a cross-context vote
        tie, where the out-of-context lower-seq duplicate must not win."""
        import numpy as np

        from tiresias_tpu.api import Tiresias
        from tiresias_tpu.config import TiresiasConfig
        from tiresias_tpu.utils.audio import synth_tone

        SR = 8000
        eng = Tiresias(
            TiresiasConfig(data_dir=str(tmp_path / "d")), restore=False
        )
        eng.create_context("c")
        eng.create_context("other")
        rng = np.random.default_rng(5)
        base = rng.uniform(-30, 25, size=(64, 2)).astype(np.float32)
        # identical fingerprints across contexts: the FIRST-inserted copy
        # lives in "other", so an unfiltered search would D5-pick it
        eng.store.add_audio("decoy", "other", base, "hd", dedupe=False)
        eng.store.add_audio("mine", "c", base, "hm", dedupe=False)
        queries = [synth_tone(300 + 90 * i, 1.0, SR) for i in range(2)]

        assert eng._fused_search_batch(
            "c", queries, SR, None, 5.0, -1, -1, True, None, None
        ) is not None  # the filtered search really takes the fast path
        fused = eng.search_pcm_batch(
            "c", queries, SR, tolerance=5.0, filter_context=True
        )
        assert all(r.name == "mine" for r in fused if r.found)
        eng._fused_search_batch = lambda *a, **k: None
        eng._device_ranked_batch = lambda *a, **k: None
        staged = eng.search_pcm_batch(
            "c", queries, SR, tolerance=5.0, filter_context=True
        )
        for f, s in zip(fused, staged):
            assert (f.status, f.uuid, f.match_count, f.frame_count) == (
                s.status, s.uuid, s.match_count, s.frame_count)
        # unknown context: clean NOTFOUND on the fused path too
        r = eng.search_pcm(
            "ghost", queries[0], SR, tolerance=5.0, filter_context=True
        )
        assert r.status == "NOTFOUND" and r.match_count == 0
        eng.close()
