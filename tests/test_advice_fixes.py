"""Regression tests for the round-1 advisor findings (ADVICE.md).

One test class per finding; each pins the fixed behavior.
"""

import asyncio

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import ContextConfig, MatchConfig, TiresiasConfig
from tiresias_tpu.store import FingerprintStore
from tiresias_tpu.utils.audio import synth_tone, write_wav

SR = 8000


class TestConfigFreqIgnoreHonored:
    """ADVICE #1 (medium): freq_ignore_low/high set in tiresias.conf must
    take effect on searches that don't pass the args explicitly."""

    def _engine(self, tmp_path, match: MatchConfig) -> Tiresias:
        directory = tmp_path / "media"
        directory.mkdir(exist_ok=True)
        write_wav(str(directory / "a.wav"), synth_tone(440, 0.5, SR), SR)
        cfg = TiresiasConfig(
            contexts=(ContextConfig("media", str(directory)),),
            data_dir=str(tmp_path / "data"),
            match=match,
        )
        eng = Tiresias(cfg, restore=False)
        eng.sync()
        return eng

    def test_config_band_filter_applies_by_default(self, tmp_path):
        # freq_ignore_low=10**9 → band_lo = 10*log10(1e9) = 90 dB: every
        # real frame value (~ -40..25) is out of band → zero votes.
        eng = self._engine(
            tmp_path, MatchConfig(freq_ignore_low=10**9, freq_ignore_high=10**12)
        )
        tone = synth_tone(440, 0.5, SR)
        r = eng.search_pcm("media", tone, SR, tolerance=1.0)
        assert r.status == "NOTFOUND"
        assert r.match_count == 0
        eng.close()

    def test_disabled_by_default_and_explicit_arg_wins(self, tmp_path):
        eng = self._engine(tmp_path, MatchConfig())
        tone = synth_tone(440, 0.5, SR)
        r = eng.search_pcm("media", tone, SR, tolerance=1.0)
        assert r.status == "FOUND"
        # explicit call-time band overrides the (disabled) config default
        r2 = eng.search_pcm(
            "media", tone, SR, tolerance=1.0,
            freq_ignore_low=10**9, freq_ignore_high=10**12,
        )
        assert r2.status == "NOTFOUND"
        eng.close()


class TestDuplicateHashDeletion:
    """ADVICE #2: deleting one of two duplicate-hash entries must keep
    find_by_hash pointing at the survivor."""

    def test_survivor_still_found(self):
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        fp = np.zeros((4, 2), np.float32)
        e1 = store.add_audio("a1.wav", "c", fp, "deadbeef")
        e2 = store.add_audio("a2.wav", "c", fp, "deadbeef", dedupe=False)
        assert e1 is not None and e2 is not None
        assert store.delete_audio(e1.uuid)
        survivor = store.find_by_hash("c", "deadbeef")
        assert survivor is not None
        assert survivor.uuid == e2.uuid
        # deleting the survivor clears the index
        assert store.delete_audio(e2.uuid)
        assert store.find_by_hash("c", "deadbeef") is None

    def test_delete_non_indexed_duplicate_keeps_index(self):
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        fp = np.zeros((4, 2), np.float32)
        e1 = store.add_audio("a1.wav", "c", fp, "cafef00d")
        e2 = store.add_audio("a2.wav", "c", fp, "cafef00d", dedupe=False)
        # the index points at one of them; delete the OTHER one
        indexed = store.find_by_hash("c", "cafef00d")
        other = e2 if indexed.uuid == e1.uuid else e1
        assert store.delete_audio(other.uuid)
        assert store.find_by_hash("c", "cafef00d").uuid == indexed.uuid


class TestStreamingOpenValidation:
    """ADVICE #3: out-of-range coefs must raise at open() time, not poison
    the shared scorer loop later."""

    def test_bad_coefs_rejected_at_open(self, tmp_path):
        from tiresias_tpu.serve.streaming import StreamingRecognizer

        cfg = TiresiasConfig(data_dir=str(tmp_path / "data"))
        eng = Tiresias(cfg, restore=False)
        eng.create_context("c")
        rec = StreamingRecognizer(eng, samplerate=SR)
        with pytest.raises(ValueError, match="coefs"):
            rec.open("chan-1", "c", coefs=5)
        with pytest.raises(ValueError, match="coefs"):
            rec.open("chan-1", "c", coefs=0)
        rec.open("chan-1", "c", coefs=2)  # valid upper bound ok
        eng.close()


class TestServerStopWithoutStart:
    """ADVICE #4: stop() on a never-started server must shut down cleanly."""

    def test_stop_is_clean(self, tmp_path):
        from tiresias_tpu.serve.server import RecognitionServer

        cfg = TiresiasConfig(data_dir=str(tmp_path / "data"))
        eng = Tiresias(cfg, restore=False)
        srv = RecognitionServer(eng)
        asyncio.run(srv.stop())  # no AttributeError
        eng.close()


class TestLatticeOutOfRange:
    """ADVICE #5: query values outside the lattice must contribute zero
    votes (matching match_jax), not be clipped onto the edge bucket."""

    def _db(self):
        rng = np.random.default_rng(7)
        db = rng.uniform(-40.0, 25.0, size=(6, 16, 2)).astype(np.float32)
        mask = np.ones((6, 16), bool)
        return db, mask

    def test_out_of_range_scores_zero(self):
        import jax.numpy as jnp

        from tiresias_tpu.ops import match_jax
        from tiresias_tpu.ops.match_lattice import build_value_map, search_lattice

        db, mask = self._db()
        vm = build_value_map(jnp.asarray(db[..., 0]), jnp.asarray(mask))
        for bad in (500.0, -900.0, np.inf, -np.inf, np.nan):
            q = np.full((1, 4, 2), bad, np.float32)
            _, _, votes = search_lattice(vm, q, tolerance=10.0)
            assert int(np.asarray(votes).sum()) == 0, bad
            # parity: the exact matcher also scores zero for these
            _, _, votes_ref = match_jax.search_batch(
                jnp.asarray(db), jnp.asarray(mask), q, tolerance=10.0
            )
            assert int(np.asarray(votes_ref).sum()) == 0, bad

    def test_in_range_parity_unchanged(self):
        import jax.numpy as jnp

        from tiresias_tpu.ops import match_jax
        from tiresias_tpu.ops.match_lattice import build_value_map, search_lattice

        db, mask = self._db()
        rng = np.random.default_rng(11)
        q = rng.uniform(-45.0, 30.0, size=(3, 8, 2)).astype(np.float32)
        vm = build_value_map(jnp.asarray(db[..., 0]), jnp.asarray(mask))
        _, _, votes_lat = search_lattice(vm, q, tolerance=2.0)
        _, _, votes_ref = match_jax.search_batch(
            jnp.asarray(db), jnp.asarray(mask), q, tolerance=2.0
        )
        np.testing.assert_array_equal(
            np.asarray(votes_lat), np.asarray(votes_ref)
        )
