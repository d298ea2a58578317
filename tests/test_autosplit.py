"""Auto-split of over-long audio at ingest (round-3 item 6).

The reference fingerprints unbounded-length files (its loop runs until the
source ends, /root/reference/src/fp_handler.c:632-661). Dense tiers cap a
row's frame capacity, so longer audios split into segment rows sharing one
catalog entry; the lattice path min-combines their distance-map rows (exact
∃t-over-whole-audio semantics) and the general matcher sums per-segment
votes (additive — PARITY.md D15).

MAX_TIER_FRAMES is monkeypatched small so tests stay fast; the split logic
reads the module global at call time.
"""

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import TiresiasConfig
from tiresias_tpu.store import fingerprint_store as fs
from tiresias_tpu.store.fingerprint_store import FingerprintStore, split_frames
from tiresias_tpu.utils.audio import synth_chirp

SR = 8000


@pytest.fixture()
def small_tiers(monkeypatch):
    monkeypatch.setattr(fs, "MAX_TIER_FRAMES", 128)


def _fp(rng, n):
    return rng.uniform(-40.0, 20.0, size=(n, 2)).astype(np.float32)


class TestSplitFrames:
    def test_fits(self):
        assert split_frames(100) == [100]
        assert split_frames(fs.MAX_TIER_FRAMES) == [fs.MAX_TIER_FRAMES]

    def test_splits(self, small_tiers):
        assert split_frames(300) == [128, 128, 44]
        assert split_frames(256) == [128, 128]


class TestStoreAutoSplit:
    def test_add_get_roundtrip(self, small_tiers):
        rng = np.random.default_rng(31)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        fp = _fp(rng, 300)
        e = store.add_audio("long", "c", fp, "h-long")
        assert e.n_frames == 300
        assert len(store) == 1
        np.testing.assert_array_equal(store.get_fingerprint(e.uuid), fp)
        # three segment rows in one tier, one catalog entry
        v = store.search_views()[0]
        assert v.n_audios == 3
        assert all(x is e for x in v.entries)
        assert v.segments == ((0, 1, 2),)
        assert v.row_frames == (128, 128, 44)

    def test_lattice_map_min_combines(self, small_tiers):
        """The combined distance map row equals a map built over the whole
        unsplit audio — exact reference semantics."""
        from tiresias_tpu.ops.match_lattice import build_value_map

        rng = np.random.default_rng(32)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        fp = _fp(rng, 300)
        store.add_audio("long", "c", fp, "h")
        v = store.search_views()[0]
        vm = np.asarray(store.value_map_for(v))
        # row 0 = combined; rows 1-2 inert
        assert np.isinf(vm[1]).all() and np.isinf(vm[2]).all()
        import jax.numpy as jnp

        whole = np.asarray(
            build_value_map(
                jnp.asarray(fp[None, :, 0]),
                jnp.ones((1, 300), bool),
            )
        )[0]
        np.testing.assert_array_equal(vm[0], whole)

    def test_delete_tombstones_all_segments(self, small_tiers):
        rng = np.random.default_rng(33)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        e_long = store.add_audio("long", "c", _fp(rng, 300), "h1")
        e_short = store.add_audio("short", "c", _fp(rng, 100), "h2")
        store.search_views()
        assert store.delete_audio(e_long.uuid)
        v128 = [v for v in store.search_views() if v.tier_frames == 128][0]
        assert v128.dead_rows == frozenset({0, 1, 2})
        assert not np.asarray(v128.mask)[:3].any()
        assert store.get_fingerprint(e_long.uuid) is None
        assert store.get_fingerprint(e_short.uuid) is not None

    def test_checkpoint_roundtrip(self, small_tiers, tmp_path):
        rng = np.random.default_rng(34)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        fp_long = _fp(rng, 300)
        fp_short = _fp(rng, 60)
        e1 = store.add_audio("long", "c", fp_long, "h1")
        e2 = store.add_audio("short", "c", fp_short, "h2")
        store.save(str(tmp_path))
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 2
        np.testing.assert_array_equal(loaded.get_fingerprint(e1.uuid), fp_long)
        np.testing.assert_array_equal(loaded.get_fingerprint(e2.uuid), fp_short)
        # tombstoned long audio survives a save/load cycle as deleted
        loaded.delete_audio(e1.uuid)
        loaded.save(str(tmp_path))
        again = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(again) == 1
        assert again.get_fingerprint(e1.uuid) is None
        np.testing.assert_array_equal(again.get_fingerprint(e2.uuid), fp_short)


class TestEngineAutoSplit:
    def _engine(self, tmp_path, **match):
        from tiresias_tpu.config import MatchConfig

        return Tiresias(
            TiresiasConfig(
                data_dir=str(tmp_path),
                match=MatchConfig(**match) if match else MatchConfig(),
            ),
            restore=False,
        )

    def test_long_audio_selfmatch_fused_lattice(self, small_tiers, tmp_path):
        """>1-tier audio ingests and an excerpt from its SECOND half
        matches — the dialplan (fused lattice) configuration."""
        eng = self._engine(tmp_path)
        eng.create_context("c")
        # ~15 s chirp -> ~468 frames -> 4 segments at the patched cap
        long_pcm = synth_chirp(200, 1800, 15.0, SR)
        e = eng.add_audio_pcm("c", "long", long_pcm, SR)
        assert e is not None and e.n_frames > 3 * 128
        excerpt = long_pcm[8 * SR : 11 * SR]
        r = eng.search_pcm("c", excerpt, SR, tolerance=1.0)
        assert r.found and r.uuid == e.uuid
        assert r.match_count > 0.9 * r.frame_count

    def test_long_audio_selfmatch_general_matcher(self, small_tiers, tmp_path):
        """Same corpus through the general (coefs=2, no-trunc) matcher —
        the additive-merge path."""
        eng = self._engine(
            tmp_path, coefs=2, tolerance=0.01, trunc_coef1=False
        )
        eng.create_context("c")
        long_pcm = synth_chirp(200, 1800, 15.0, SR)
        short_pcm = synth_chirp(900, 300, 4.0, SR)
        e = eng.add_audio_pcm("c", "long", long_pcm, SR)
        e2 = eng.add_audio_pcm("c", "short", short_pcm, SR)
        r = eng.search_pcm("c", long_pcm[8 * SR : 11 * SR], SR)
        assert r.found and r.uuid == e.uuid
        r2 = eng.search_pcm("c", short_pcm[: 2 * SR], SR)
        assert r2.found and r2.uuid == e2.uuid
        # top-k lists the long audio ONCE
        ranked = eng.search_pcm_topk(
            "c", long_pcm[8 * SR : 11 * SR], SR, k=5
        )
        assert [x.uuid for x in ranked].count(e.uuid) == 1

    def test_restart_then_delete(self, small_tiers, tmp_path):
        eng = self._engine(tmp_path)
        eng.create_context("c")
        long_pcm = synth_chirp(300, 1500, 12.0, SR)
        e = eng.add_audio_pcm("c", "long", long_pcm, SR)
        eng.close()
        eng2 = Tiresias(TiresiasConfig(data_dir=str(tmp_path)))
        r = eng2.search_pcm("c", long_pcm[4 * SR : 7 * SR], SR, tolerance=1.0)
        assert r.found and r.uuid == e.uuid
        eng2.delete_audio(e.uuid)
        r2 = eng2.search_pcm("c", long_pcm[4 * SR : 7 * SR], SR, tolerance=1.0)
        assert not r2.found
