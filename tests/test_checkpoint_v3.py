"""Incremental (v3) checkpoints: segmented tier files + catalog commit.

Per-ingest checkpoints must cost O(new rows), not O(whole DB): unchanged
full segments are reused by filename; the catalog rename is the atomic
commit; unreferenced files are garbage-collected; v2 checkpoints still
load. Replaces the reference's save-only-at-unload backup
(/root/reference/src/db_ctx_handler.c:673-717; PARITY.md D2).
"""

import json
import os

import numpy as np

from tiresias_tpu.store import FingerprintStore
from tiresias_tpu.store.fingerprint_store import SEGMENT_ROWS


def _fp(rng, n=5):
    return rng.uniform(-30, 20, (n, 2)).astype(np.float32)


def _segments(path) -> dict:
    with open(os.path.join(path, "catalog.json")) as f:
        return json.load(f)["tiers"]


class TestIncrementalSave:
    def test_unchanged_segments_reused(self, tmp_path):
        rng = np.random.default_rng(1)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        # fill one full segment plus a bit
        for i in range(SEGMENT_ROWS + 10):
            store.add_audio(f"a{i}", "c", _fp(rng), f"h{i}")
        store.save(str(tmp_path))
        segs1 = _segments(tmp_path)["128"]
        assert len(segs1) == 2
        assert segs1[0][1] == SEGMENT_ROWS and segs1[1][1] == 10
        # append a few more: the full first segment must be REUSED
        for i in range(3):
            store.add_audio(f"b{i}", "c", _fp(rng), f"hb{i}")
        store.save(str(tmp_path))
        segs2 = _segments(tmp_path)["128"]
        assert segs2[0] == segs1[0]  # same filename, untouched
        assert segs2[1][0] != segs1[1][0]  # partial tail rewritten
        assert segs2[1][1] == 13

    def test_delete_tombstones_without_segment_rewrites(self, tmp_path):
        """v4: a delete rewrites NO segment files — it only records the
        dead row in the catalog; the row is dropped at load. After a
        reload, the first save rewrites from the (compacted-away) dead row
        on, since in-memory rows diverge from the old segments there."""
        import json as _json

        rng = np.random.default_rng(2)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        for i in range(2 * SEGMENT_ROWS + 5):
            store.add_audio(f"a{i}", "c", _fp(rng), f"h{i}")
        store.save(str(tmp_path))
        segs1 = _segments(tmp_path)["128"]
        victim = store.get_audios_by_context("c")[SEGMENT_ROWS + 7]
        vfp = store.get_fingerprint(victim.uuid)
        assert store.delete_audio(victim.uuid)
        store.save(str(tmp_path))
        segs2 = _segments(tmp_path)["128"]
        assert segs2 == segs1  # every segment reused verbatim
        with open(tmp_path / "catalog.json") as f:
            cat = _json.load(f)
        assert cat["dead"] == {"128": [SEGMENT_ROWS + 7]}
        # reload: the tombstoned row is gone, neighbours intact
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 2 * SEGMENT_ROWS + 4
        assert loaded.get_audio(victim.uuid) is None
        for e in loaded.iter_entries():
            assert not np.array_equal(loaded.get_fingerprint(e.uuid), vfp)
        # post-reload save: segment 0 reused, dirty tail rewritten, and the
        # result round-trips
        loaded.save(str(tmp_path))
        segs3 = _segments(tmp_path)["128"]
        assert segs3[0] == segs1[0]
        assert segs3[1][0] != segs1[1][0]
        assert sum(s[1] for s in segs3) == 2 * SEGMENT_ROWS + 4
        again = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(again) == 2 * SEGMENT_ROWS + 4

    def test_round_trip_and_gc(self, tmp_path):
        rng = np.random.default_rng(3)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        fps = {}
        for i in range(20):
            fp = _fp(rng, n=4 + i)
            e = store.add_audio(f"a{i}", "c", fp, f"h{i}")
            fps[e.uuid] = fp
        store.save(str(tmp_path))
        for gen in range(3):  # several more generations
            store.add_audio(f"x{gen}", "c", _fp(rng), f"hx{gen}")
            store.save(str(tmp_path))
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 23
        for uuid, fp in fps.items():
            np.testing.assert_array_equal(loaded.get_fingerprint(uuid), fp)
        # GC: only files referenced by current or .bak remain
        live = set()
        for suffix in ("", ".bak"):
            with open(os.path.join(tmp_path, "catalog.json" + suffix)) as f:
                for segs in json.load(f)["tiers"].values():
                    live |= {s[0] for s in segs}
        on_disk = {n for n in os.listdir(tmp_path) if n.endswith(".npy")}
        assert on_disk == live

    def test_restored_store_saves_incrementally(self, tmp_path):
        rng = np.random.default_rng(4)
        store = FingerprintStore(n_coefs=2)
        store.create_context("c")
        for i in range(SEGMENT_ROWS):
            store.add_audio(f"a{i}", "c", _fp(rng), f"h{i}")
        store.save(str(tmp_path))
        segs1 = _segments(tmp_path)["128"]
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        loaded.add_audio("extra", "c", _fp(rng), "hextra")
        loaded.save(str(tmp_path))
        segs2 = _segments(tmp_path)["128"]
        assert segs2[0] == segs1[0]  # restore carried the manifest over

    def test_v2_checkpoint_still_loads(self, tmp_path):
        rng = np.random.default_rng(5)
        fp = _fp(rng, n=6)
        entry = {
            "uuid": "u-1", "name": "old.wav", "context": "c",
            "hash": "deadbeef", "n_frames": 6,
        }
        catalog = {
            "version": 2, "n_coefs": 2, "contexts": {"c": ""},
            "entries": [entry],
        }
        with open(tmp_path / "catalog.json", "w") as f:
            json.dump(catalog, f)
        tier = np.full((1, 128, 2), -1e6, np.float32)
        tier[0, :6] = fp
        np.savez_compressed(tmp_path / "fingerprints.npz", tier_128=tier)
        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(loaded) == 1
        np.testing.assert_array_equal(loaded.get_fingerprint("u-1"), fp)
        # and the next save upgrades it to the current version
        loaded.save(str(tmp_path))
        with open(tmp_path / "catalog.json") as f:
            assert json.load(f)["version"] == 4
        reloaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        np.testing.assert_array_equal(reloaded.get_fingerprint("u-1"), fp)

    def test_v2_upgrade_keeps_bak_pair_consistent(self, tmp_path):
        """The first v3 save over a v2 layout must rotate the legacy
        matrix alongside the catalog: if the fresh v3 generation is then
        corrupted, the .bak fallback must restore the LAST v2 state, not
        pair the newest v2 catalog with an older matrix."""
        rng = np.random.default_rng(6)
        fp = _fp(rng, n=6)
        entry = {
            "uuid": "u-1", "name": "old.wav", "context": "c",
            "hash": "deadbeef", "n_frames": 6,
        }
        catalog = {
            "version": 2, "n_coefs": 2, "contexts": {"c": ""},
            "entries": [entry],
        }
        with open(tmp_path / "catalog.json", "w") as f:
            json.dump(catalog, f)
        tier = np.full((1, 128, 2), -1e6, np.float32)
        tier[0, :6] = fp
        np.savez_compressed(tmp_path / "fingerprints.npz", tier_128=tier)
        # stale .bak pair from an older v2 generation (different row count)
        with open(tmp_path / "catalog.json.bak", "w") as f:
            json.dump({**catalog, "entries": []}, f)
        np.savez_compressed(
            tmp_path / "fingerprints.npz.bak",
            tier_128=np.zeros((0, 128, 2), np.float32),
        )

        loaded = FingerprintStore.load(str(tmp_path), n_coefs=2)
        loaded.save(str(tmp_path))  # upgrade to v3

        # corrupt the fresh v3 generation -> load must fall back to .bak
        (tmp_path / "catalog.json").write_text("{corrupt")
        recovered = FingerprintStore.load(str(tmp_path), n_coefs=2)
        assert len(recovered) == 1
        np.testing.assert_array_equal(recovered.get_fingerprint("u-1"), fp)

    def test_two_lineages_do_not_collide(self, tmp_path):
        """A different store saving into the same directory must not
        overwrite files the existing generations reference."""
        rng = np.random.default_rng(6)
        s1 = FingerprintStore(n_coefs=2)
        s1.create_context("c")
        s1.add_audio("a", "c", _fp(rng), "h1")
        s1.save(str(tmp_path))
        before = {
            n: os.path.getmtime(tmp_path / n)
            for n in os.listdir(tmp_path) if n.endswith(".npy")
        }
        s2 = FingerprintStore(n_coefs=2)
        s2.create_context("c")
        s2.add_audio("b", "c", _fp(rng), "h2")
        s2.save(str(tmp_path))
        for name, mtime in before.items():
            if os.path.exists(tmp_path / name):  # GC may remove, never mutate
                assert os.path.getmtime(tmp_path / name) == mtime
