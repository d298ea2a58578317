"""Tiered store: mixed-length corpora without dense-matrix blow-up.

Audios live whole in the frame tier that fits them (128·2^k); searches scan
every tier and concatenate votes — exactness is preserved because no audio
is split. This removes the documented limitation where one long file
inflated every row of a single dense matrix.
"""

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import TiresiasConfig
from tiresias_tpu.store import FingerprintStore
from tiresias_tpu.store.fingerprint_store import MAX_TIER_FRAMES, tier_for
from tiresias_tpu.utils.audio import synth_chirp, synth_tone

SR = 8000
EXT = dict(coefs=2, tolerance=0.01, trunc_coef1=False)


def _fp(n_frames: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.uniform(-40, 25, size=(n_frames, 2)).astype(np.float32)


class TestTierAssignment:
    def test_tier_for(self):
        assert tier_for(1) == 128
        assert tier_for(128) == 128
        assert tier_for(129) == 256
        assert tier_for(1000) == 1024
        with pytest.raises(ValueError):
            tier_for(MAX_TIER_FRAMES + 1)

    def test_memory_not_inflated_by_long_audio(self):
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        for i in range(10):
            store.add_audio(f"s{i}", "c", _fp(100, i), f"h{i}")
        store.add_audio("long", "c", _fp(50_000, 99), "hlong")
        # short audios stay in the 128-frame tier: their matrix must not
        # have grown to the long audio's tier
        views = store.search_views()
        tiers = {v.tier_frames: v.n_audios for v in views}
        assert tiers[128] == 10
        assert tiers[tier_for(50_000)] == 1
        # dense single-matrix layout would be 11*65536 frames; tiered is
        # 10*128 + 65536 — over 10x smaller
        tiered_frames = sum(v.tier_frames * v.n_audios for v in views)
        assert tiered_frames < 11 * tier_for(50_000) / 5


class TestMixedTierSearch:
    @pytest.fixture()
    def store(self):
        s = FingerprintStore(n_coefs=2)
        s.create_context("c")
        # distinct value clusters so top-1 is unambiguous
        self_fps = []
        for i in range(6):
            n = [20, 100, 300, 700, 1500, 40][i]
            fp = np.full((n, 2), -30.0 + 7.0 * i, dtype=np.float32)
            fp += np.random.default_rng(i).uniform(-0.2, 0.2, fp.shape).astype(
                np.float32
            )
            s.add_audio(f"a{i}", "c", fp, f"h{i}")
            self_fps.append(fp)
        return s, self_fps

    def test_search_across_tiers_matches_oracle(self, store):
        from tiresias_tpu.ops.match_ref import search_reference

        s, fps = store
        views = s.search_views()
        assert len(views) >= 3  # mixed tiers engaged
        # oracle order: concatenated view order
        entries = s.view_entries()
        by_uuid = {e.uuid: fps[int(e.name[1])] for e in s.entries}
        db_list = [by_uuid[e.uuid] for e in entries]
        from tiresias_tpu.ops.match_lattice import search_lattice

        rng = np.random.default_rng(7)
        q = rng.uniform(-35, 15, size=(24, 2)).astype(np.float32)
        # lattice per view, concatenated — vs the flat oracle
        votes_parts = []
        for v in views:
            _, _, votes = search_lattice(
                s.value_map_for(v), q[None], None, tolerance=1.0
            )
            votes_parts.append(np.asarray(votes)[:, : v.n_audios])
        got = np.concatenate(votes_parts, axis=1)[0]
        ref = search_reference(db_list, q, coefs=1, tolerance=1.0)
        np.testing.assert_array_equal(got, ref.votes)

    def test_engine_level_mixed_search(self, tmp_path):
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        eng.create_context("c")
        short = synth_tone(500, 1.0, SR)  # 32 frames → tier 128
        long = synth_chirp(200, 1200, 90.0, SR)  # ~2813 frames → tier 4096
        eng.add_audio_pcm("c", "short", short, SR)
        eng.add_audio_pcm("c", "long", long, SR)
        assert len(eng.store.search_views()) == 2
        r1 = eng.search_pcm("c", short, SR, **EXT)
        assert r1.found and r1.name == "short"
        # an excerpt of the long audio must match the long audio
        r2 = eng.search_pcm("c", np.asarray(long[: 5 * SR]), SR, **EXT)
        assert r2.found and r2.name == "long"

    def test_delete_from_one_tier(self, store):
        s, _ = store
        victim = next(e for e in s.entries if e.name == "a2")
        assert s.delete_audio(victim.uuid)
        assert s.get_fingerprint(victim.uuid) is None
        assert len(s) == 5
        # remaining fingerprints intact
        for e in s.iter_entries():
            assert s.get_fingerprint(e.uuid).shape[0] == e.n_frames


class TestTieredCheckpoint:
    def test_v2_round_trip_mixed(self, tmp_path):
        s = FingerprintStore(n_coefs=2)
        s.create_context("c")
        fps = [_fp(n, n) for n in (50, 200, 999, 60)]
        for i, fp in enumerate(fps):
            s.add_audio(f"a{i}", "c", fp, f"h{i}")
        s.save(str(tmp_path))
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 4
        for i, e in enumerate(loaded.iter_entries()):
            np.testing.assert_array_equal(loaded.get_fingerprint(e.uuid), fps[i])

    def test_v1_checkpoint_still_loads(self, tmp_path):
        # synthesize a version-1 checkpoint (single dense matrix)
        import json

        fps = [_fp(10, 1), _fp(30, 2)]
        entries = []
        t = 32
        matrix = np.full((2, t, 2), -1e6, np.float32)
        for i, fp in enumerate(fps):
            matrix[i, : len(fp)] = fp
            entries.append(
                dict(uuid=f"u{i}", name=f"a{i}", context="c", hash=f"h{i}",
                     n_frames=len(fp))
            )
        with open(tmp_path / "fingerprints.npz", "wb") as f:
            np.savez_compressed(f, matrix=matrix)
        (tmp_path / "catalog.json").write_text(
            json.dumps({"version": 1, "n_coefs": 2,
                        "contexts": {"c": ""}, "entries": entries})
        )
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 2
        for i, e in enumerate(loaded.iter_entries()):
            np.testing.assert_array_equal(loaded.get_fingerprint(e.uuid), fps[i])
