"""Device-side top-1 ranking (engine._device_ranked_batch).

The staged search path used to read the full [B, A] votes matrix back to
host per search just to argmax it (4 MB/query at 1M tracks); the
device-ranked path reduces each view to three [B] vectors on device. These
tests pin exact agreement with the full-votes path, including the D5
lowest-insertion tiebreak ACROSS tiers, and that the heavy path is not
silently re-engaged.
"""

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import TiresiasConfig
from tiresias_tpu.utils.audio import synth_tone

SR = 8000


@pytest.fixture()
def eng(tmp_path):
    e = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
    e.create_context("c")
    yield e
    e.close()


def _strict(**kw):
    # tolerance small enough that distinct pure tones do NOT cross-match
    # (at 1.0 dB they do, turning every case into a D5 tie)
    return dict(coefs=2, tolerance=0.01, trunc_coef1=False, **kw)


class TestDeviceRankedParity:
    def test_cross_tier_tie_prefers_first_inserted(self, eng):
        """A hop-aligned query fully matches both a 6 s audio (tier 256)
        and an identical short audio (tier 128) under bag voting — the D5
        tiebreak must pick the FIRST INSERTED across tiers, exactly like
        the full-votes lexsort. (Durations are exact hop multiples so the
        final query frame carries no zero padding, which would otherwise
        break the tie: the padded frame only exists verbatim in the short
        audio.)"""
        tone = synth_tone(440, 8192 / SR, SR)  # 32 hops exactly
        eng.add_audio_pcm("c", "long_first", synth_tone(440, 6.0, SR), SR)
        eng.add_audio_pcm("c", "short_second", tone, SR)
        assert len(eng.store.search_views()) == 2  # really two tiers
        r = eng.search_pcm("c", tone, SR, **_strict())
        # CONTROL: the full-votes host-ranked path must agree exactly,
        # tie included (device top-k forced off for the control)
        eng._device_ranked_topk = lambda *a, **kw: None
        topk = eng.search_pcm_topk("c", tone, SR, k=2, **_strict())
        assert topk[0].match_count == topk[1].match_count  # a true tie
        assert r.status == "FOUND" and r.name == "long_first"
        assert topk[0].name == r.name
        assert topk[0].match_count == r.match_count == r.frame_count

    def test_reversed_insertion_flips_winner(self, eng):
        tone = synth_tone(440, 8192 / SR, SR)
        eng.add_audio_pcm("c", "short_first", tone, SR)
        eng.add_audio_pcm("c", "long_second", synth_tone(440, 6.0, SR), SR)
        r = eng.search_pcm("c", tone, SR, **_strict())
        assert r.name == "short_first"

    def test_notfound_and_counts(self, eng):
        eng.add_audio_pcm("c", "a", synth_tone(300, 1.0, SR), SR)
        r = eng.search_pcm(
            "c", synth_tone(2600, 1.0, SR), SR,
            coefs=2, tolerance=0.001, trunc_coef1=False,
        )
        assert r.status == "NOTFOUND" and r.match_count == 0
        assert r.frame_count == 32

    def test_device_path_engages_and_full_votes_path_skipped(
        self, eng, monkeypatch
    ):
        """For an unfiltered multi-tier search the [B, A] readback path
        must not run at all."""
        eng.add_audio_pcm("c", "a", synth_tone(300, 1.0, SR), SR)
        eng.add_audio_pcm("c", "b", synth_tone(500, 6.0, SR), SR)

        def boom(*a, **k):
            raise AssertionError("full-votes readback on the hot path")

        monkeypatch.setattr(eng, "_compute_votes", boom)
        r = eng.search_pcm("c", synth_tone(500, 1.0, SR), SR, **_strict())
        assert r.status == "FOUND" and r.name == "b"

    def test_filtered_search_still_exact(self, eng, monkeypatch):
        """filter_context stays on the device-ranked path (the per-view
        ctx-id array zeros out-of-context votes inside the scoring
        dispatch) — the [B, A] readback path must not run, and the
        out-of-context decoy (with the winning D5 seq) must not win."""
        eng.create_context("other")
        eng.add_audio_pcm("other", "decoy", synth_tone(440, 1.0, SR), SR)
        eng.add_audio_pcm("c", "mine", synth_tone(440, 1.0, SR), SR)

        def boom(*a, **k):
            raise AssertionError("full-votes readback on the filtered path")

        monkeypatch.setattr(eng, "_compute_votes", boom)
        r = eng.search_pcm(
            "c", synth_tone(440, 1.0, SR), SR,
            filter_context=True, **_strict(),
        )
        assert r.name == "mine"
        # filtered to a context whose rows can't match -> NOTFOUND (the
        # masked view's zero-vote winner must never be attributed)
        r2 = eng.search_pcm(
            "other", synth_tone(2600, 1.0, SR), SR,
            filter_context=True, **_strict(),
        )
        assert r2.status == "NOTFOUND" and r2.match_count == 0
        # top-k under the filter lists only in-context audios, on device
        topk = eng.search_pcm_topk(
            "c", synth_tone(440, 1.0, SR), SR, k=4,
            filter_context=True, **_strict(),
        )
        assert [t.name for t in topk] == ["mine"]

    def test_live_append_keeps_seq_cache_correct(self, eng):
        """seq_dev extends incrementally on append; a new first-place
        entry appended after a search must win subsequent searches."""
        eng.add_audio_pcm("c", "a", synth_tone(300, 1.0, SR), SR)
        r = eng.search_pcm("c", synth_tone(300, 1.0, SR), SR, **_strict())
        assert r.name == "a"  # builds + caches seq_dev for the view
        eng.add_audio_pcm("c", "b", synth_tone(900, 1.0, SR), SR)
        r = eng.search_pcm("c", synth_tone(900, 1.0, SR), SR, **_strict())
        assert r.name == "b"
        # and a delete (tombstone) cannot leave the dead row winning
        uuid = [e for e in eng.get_audios("c") if e.name == "b"][0].uuid
        assert eng.delete_audio(uuid)
        r = eng.search_pcm("c", synth_tone(900, 1.0, SR), SR, **_strict())
        assert r.name != "b"

    def test_topk_device_matches_full_votes(self, eng):
        """Device top-k (lax.top_k per view + host merge) must equal the
        full-votes lexsort ranking, across tiers and including ties."""

        tone = synth_tone(440, 8192 / SR, SR)
        eng.add_audio_pcm("c", "long_first", synth_tone(440, 6.0, SR), SR)
        eng.add_audio_pcm("c", "short_second", tone, SR)
        for i in range(5):
            eng.add_audio_pcm(
                "c", f"f{i}", synth_tone(700 + 90 * i, 1.0, SR), SR
            )
        for q in (tone, synth_tone(790, 1.0, SR)):
            dev = eng.search_pcm_topk("c", q, SR, k=4, **_strict())
            saved = eng._device_ranked_topk
            eng._device_ranked_topk = lambda *a, **kw: None
            try:
                host = eng.search_pcm_topk("c", q, SR, k=4, **_strict())
            finally:
                eng._device_ranked_topk = saved
            assert [(r.name, r.match_count) for r in dev] == [
                (r.name, r.match_count) for r in host
            ]

    def test_batch_matches_singletons(self, eng):
        for i in range(4):
            eng.add_audio_pcm(
                "c", f"t{i}", synth_tone(250 + 120 * i, 1.0, SR), SR
            )
        eng.add_audio_pcm("c", "long", synth_tone(610, 6.0, SR), SR)
        queries = [synth_tone(250 + 120 * i, 1.0, SR) for i in range(4)]
        batch = eng.search_pcm_batch("c", queries, SR, **_strict())
        singles = [
            eng.search_pcm("c", q, SR, **_strict()) for q in queries
        ]
        for b, s in zip(batch, singles):
            assert (b.name, b.match_count, b.frame_count) == (
                s.name, s.match_count, s.frame_count
            )


class TestRandomizedDeviceVsHostRank:
    def test_random_configs_agree(self, eng):
        """Seeded sweep: random noise corpus over two tiers, random search
        configs (coefs/tolerance/truncation/aligned/bands) — the
        device-ranked result must equal the full-votes host ranking for
        every single one."""
        rng = np.random.default_rng(42)
        for i in range(6):
            dur = float(rng.uniform(0.5, 1.5))
            pcm = (0.3 * rng.standard_normal(int(dur * SR))).astype(np.float32)
            eng.add_audio_pcm("c", f"n{i}", pcm, SR)
        for i in range(2):
            pcm = (0.3 * rng.standard_normal(int(5.5 * SR))).astype(np.float32)
            eng.add_audio_pcm("c", f"big{i}", pcm, SR)
        assert len(eng.store.search_views()) == 2

        def host_search(q, **kw):
            saved_b = eng._device_ranked_batch
            saved_k = eng._device_ranked_topk
            eng._device_ranked_batch = lambda *a, **k: None
            eng._device_ranked_topk = lambda *a, **k: None
            try:
                return eng.search_pcm("c", q, SR, **kw)
            finally:
                eng._device_ranked_batch = saved_b
                eng._device_ranked_topk = saved_k

        for trial in range(12):
            q = (0.3 * rng.standard_normal(SR)).astype(np.float32)
            kw = dict(
                coefs=int(rng.integers(1, 3)),
                tolerance=float(rng.choice([0.01, 0.1, 1.0])),
                trunc_coef1=bool(rng.integers(2)),
                aligned=bool(rng.integers(2)),
            )
            if rng.integers(2):
                kw["freq_ignore_low"] = int(rng.integers(0, 4))
                kw["freq_ignore_high"] = int(rng.integers(4, 10))
            dev = eng.search_pcm("c", q, SR, **kw)
            host = host_search(q, **kw)
            assert (dev.status, dev.name, dev.match_count, dev.frame_count) \
                == (host.status, host.name, host.match_count,
                    host.frame_count), (trial, kw)
