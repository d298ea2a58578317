"""Regression tests for the code-review findings (round-1 review pass).

Each test pins one fixed defect; see the commit message for the full list.
"""

import json
import os

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import ContextConfig, TiresiasConfig
from tiresias_tpu.ops.mfcc_jax import fingerprint_signals
from tiresias_tpu.store import FingerprintStore
from tiresias_tpu.utils.audio import synth_tone, write_wav

SR = 8000


class TestMixedDtypeScaling:
    def test_int16_in_mixed_batch_is_scaled(self, dsp):
        """Finding 1: int16 signals in a float-fallback batch must get the
        /32768 scaling, bit-identical to a pure-int16 batch."""
        tone = synth_tone(440, 0.5, SR)
        i16 = np.clip(np.round(tone * 32768.0), -32768, 32767).astype(np.int16)
        fp_pure, _ = fingerprint_signals([i16], SR, dsp)
        # mixed batch: same int16 signal + one float signal forces float32
        fp_mixed, _ = fingerprint_signals([i16, tone], SR, dsp)
        np.testing.assert_array_equal(fp_mixed[0], fp_pure[0])


class TestUnreadableDirectory:
    def test_sync_is_noop_not_mass_delete(self, tmp_path):
        """Finding 3: a transiently unreadable directory must not delete the
        context's audios."""
        directory = tmp_path / "c"
        directory.mkdir()
        write_wav(str(directory / "a.wav"), synth_tone(440, 0.5, SR), SR)
        cfg = TiresiasConfig(
            contexts=(ContextConfig("c", str(directory)),),
            data_dir=str(tmp_path / "d"),
        )
        eng = Tiresias(cfg, restore=False)
        assert eng.sync().created == 1
        # simulate the mount disappearing
        import shutil

        shutil.rmtree(directory)
        report = eng.sync()
        assert report.deleted == 0
        assert len(eng.get_audios("c")) == 1  # nothing wiped


class TestTornCheckpoint:
    def test_corrupt_current_falls_back_to_bak(self, tmp_path):
        """Finding 4: a torn/corrupt current generation must fall back to
        .bak, not crash every startup."""
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        rng = np.random.default_rng(0)
        store.add_audio("a", "c", rng.uniform(-30, 20, (5, 2)).astype(np.float32), "h1")
        store.save(str(tmp_path))
        store.add_audio("b", "c", rng.uniform(-30, 20, (5, 2)).astype(np.float32), "h2")
        store.save(str(tmp_path))
        # tear the current generation's catalog mid-write
        with open(tmp_path / "catalog.json", "w") as f:
            f.write('{"version": 3, "n_coefs": 2, "entr')
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 1  # previous generation
        assert loaded.get_audios_by_context("c")[0].name == "a"

    def test_missing_segment_falls_back(self, tmp_path):
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        rng = np.random.default_rng(0)
        store.add_audio("a", "c", rng.uniform(-30, 20, (5, 2)).astype(np.float32), "h1")
        store.save(str(tmp_path))
        store.add_audio("b", "c", rng.uniform(-30, 20, (5, 2)).astype(np.float32), "h2")
        store.save(str(tmp_path))
        import json

        cat = json.load(open(tmp_path / "catalog.json"))
        current_only = {
            s[0] for segs in cat["tiers"].values() for s in segs
        } - {
            s[0]
            for segs in json.load(
                open(tmp_path / "catalog.json.bak")
            )["tiers"].values()
            for s in segs
        }
        for name in current_only:  # destroy the newest generation's data
            os.unlink(tmp_path / name)
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) in (0, 1)  # falls back, never crashes


class TestGpuGuard:
    def test_platform_detection(self, monkeypatch):
        """Finding 6: only genuine TPUs dispatch Pallas kernels."""
        from tiresias_tpu.utils import platform as plat

        class FakeDev:
            def __init__(self, p, kind):
                self.platform = p
                self.device_kind = kind

        import jax

        monkeypatch.setattr(jax, "devices", lambda: [FakeDev("gpu", "NVIDIA H100")])
        assert plat.is_tpu() is False
        monkeypatch.setattr(jax, "devices", lambda: [FakeDev("tpu", "TPU v5e")])
        assert plat.is_tpu() is True
        monkeypatch.setattr(jax, "devices", lambda: [FakeDev("axon", "TPU v5 lite")])
        assert plat.is_tpu() is True
        monkeypatch.setenv("TIRESIAS_NO_PALLAS", "1")
        assert plat.is_tpu() is False


class TestSecondReviewRound:
    def test_filter_context_with_none_scans_everything(self, tmp_path):
        """Review-2 finding 1: filter_context=True with context=None must
        keep the scan-everything behavior (PARITY.md D7), not zero votes."""
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        eng.add_audio_pcm("c", "t", synth_tone(440, 1.0, SR), SR)
        r = eng.search_pcm(
            None, synth_tone(440, 1.0, SR), SR, tolerance=1.0,
            filter_context=True,
        )
        assert r.found and r.name == "t"

    def test_tie_break_is_global_insertion_order(self, tmp_path):
        """Review-2 finding 3: equal vote counts resolve by insertion order
        (PARITY.md D5) even when tiers reorder the view."""
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        fp = np.full((300, 2), 10.0, dtype=np.float32)  # tier 512
        first = eng.store.add_audio("first-long", "c", fp, "h1")
        second = eng.store.add_audio("second-short", "c", fp[:50], "h2")
        # a query matching both equally: every frame votes for both
        q = np.full((8000,), 0.0, np.float32)  # silence → constant values
        r = eng.search_pcm("c", q, SR, tolerance=1e9)  # everything matches
        # tie at full votes; view order puts the short (tier 128) first,
        # but D5 requires the earlier-inserted long audio to win
        assert r.uuid == first.uuid, (r.name, r.match_count)

    def test_pack_batches_bounds_padding(self):
        """Review-2 finding 2: one long file must not blow up every
        batch's padding."""
        from tiresias_tpu.engine.sync import (
            MAX_BATCH_PADDED_SAMPLES,
            pack_batches,
        )

        items = [np.zeros(8000)] * 100 + [np.zeros(MAX_BATCH_PADDED_SAMPLES)]
        batches = pack_batches(items, len)
        for b in batches:
            assert len(b) * max(len(x) for x in b) <= MAX_BATCH_PADDED_SAMPLES
        assert sum(len(b) for b in batches) == 101
        # the long file sits alone
        assert any(len(b) == 1 and len(b[0]) == MAX_BATCH_PADDED_SAMPLES
                   for b in batches)

    def test_topk_rejects_unknown_kwargs(self, tmp_path):
        """Review-2 finding 6: typos must raise, not silently default."""
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        eng.add_audio_pcm("c", "t", synth_tone(440, 0.5, SR), SR)
        with pytest.raises(TypeError):
            eng.search_pcm_topk("c", synth_tone(440, 0.5, SR), SR,
                                tolerence=0.5)  # sic


class TestThirdReviewRound:
    def test_bad_hop_ms_rejected_at_open(self, tmp_path):
        """Review-3 finding 2: invalid hop_ms raises at open (a clean
        per-request error) instead of poisoning every scorer tick."""
        from tiresias_tpu.serve import StreamingRecognizer

        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        rec = StreamingRecognizer(eng, samplerate=SR)
        with pytest.raises((ValueError, TypeError)):
            rec.open("x", context="c", continuous=True, hop_ms="bogus")
        with pytest.raises(ValueError):
            rec.open("x", context="c", continuous=True, hop_ms=-5)
        # string numerics from JSON coerce fine
        rec.open("ok", context="c", duration_ms="500", hop_ms="250",
                 continuous=True)
        assert rec._channels["ok"].duration_ms == 500

    def test_hop_larger_than_duration_skips(self, tmp_path):
        """Review-3 finding 4: hop > duration tracks skip-debt so window
        spacing is exactly one hop."""
        from tiresias_tpu.serve import StreamingRecognizer

        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        eng.add_audio_pcm("c", "t", synth_tone(440, 1.0, SR), SR)
        rec = StreamingRecognizer(eng, samplerate=SR)
        seen = []
        rec.open("x", context="c", duration_ms=250, continuous=True,
                 hop_ms=1000, on_result=lambda cid, r: seen.append(r))
        # feed 2.25 s total in small frames, scoring eagerly: windows at
        # [0, .25) and [1.0, 1.25) and [2.0, 2.25) → exactly 3 results
        pcm = synth_tone(440, 2.25, SR)
        step = SR // 10
        for off in range(0, len(pcm), step):
            rec.push("x", pcm[off : off + step])
            rec.process_ready()
        assert len(seen) == 3, len(seen)

    def test_nonfinite_query_raises_cleanly(self, tmp_path):
        """Review-3 finding 3: NaN queries are rejected at the shared input
        layer, not fingerprinted into spurious matches."""
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        eng.add_audio_pcm("c", "t", synth_tone(440, 0.5, SR), SR)
        bad = np.full(SR // 2, np.nan, np.float32)
        with pytest.raises(ValueError, match="non-finite"):
            eng.search_pcm("c", bad, SR)
        with pytest.raises(ValueError, match="non-finite"):
            eng.add_audio_pcm("c", "bad", bad, SR)

    def test_push_drops_nonfinite_frames(self, tmp_path):
        from tiresias_tpu.serve import StreamingRecognizer

        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        eng.add_audio_pcm("c", "t", synth_tone(440, 1.0, SR), SR)
        rec = StreamingRecognizer(eng, samplerate=SR)
        rec.open("x", context="c", duration_ms=500, tolerance=1.0)
        rec.push("x", np.full(SR, np.nan, np.float32))  # dropped
        assert rec.process_ready() == {}  # window never fills from NaNs
        rec.push("x", synth_tone(440, 0.6, SR))
        res = rec.process_ready()
        assert res["x"].status == "FOUND"


class TestViewConsistentAttribution:
    def test_delete_between_search_and_attribution(self, tmp_path):
        """Finding 9: result attribution uses the device view's row order,
        immune to concurrent deletes compacting the live catalog."""
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        names = []
        for i in range(4):
            e = eng.add_audio_pcm("c", f"t{i}", synth_tone(300 + 200 * i, 1.0, SR), SR)
            names.append(e.uuid)
        # build the device view, then delete row 0 from the live catalog
        eng.store.device_db()
        view = eng.store.view_entries()
        eng.delete_audio(names[0])
        # the snapshot still maps the OLD row order
        assert [e.uuid for e in view] == names
        # a fresh view reflects the delete
        eng.store.device_db()
        assert [e.uuid for e in eng.store.view_entries()] == names[1:]
