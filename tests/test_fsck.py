"""`tiresias fsck`: offline checkpoint integrity verification.

The reference's persistence is one SQLite file with no offline checker;
the segmented checkpoint here is verifiable without a running process
(store.fsck_checkpoint) — catalog, per-segment shapes, dead rows,
orphans, and (--deep) the exact restore a server startup runs.
"""

import json
import os

import numpy as np
import pytest

from tiresias_tpu.store.fingerprint_store import (
    CATALOG_FILE,
    FingerprintStore,
    fsck_checkpoint,
)


@pytest.fixture()
def checkpoint(tmp_path):
    """A two-generation checkpoint with one tombstoned row."""
    rng = np.random.default_rng(4)
    st = FingerprintStore(n_coefs=2)
    st.create_context("c", "/nonexistent")
    uuids = []
    for i in range(5):
        fp = rng.uniform(-30, 20, size=(100 + i, 2)).astype(np.float32)
        e = st.add_audio(f"a{i}", "c", fp, f"h{i:08d}")
        uuids.append(e.uuid)
    d = str(tmp_path / "checkpoint")
    st.save(d)
    st.delete_audio(uuids[1])  # tombstone
    fp = rng.uniform(-30, 20, size=(50, 2)).astype(np.float32)
    st.add_audio("a5", "c", fp, "h5xxxxxx")
    st.save(d)  # second generation -> .bak exists
    return d


class TestFsck:
    def test_clean_checkpoint_ok(self, checkpoint):
        r = fsck_checkpoint(checkpoint, deep=True)
        assert r["ok"] is True
        cur = r["generations"]["current"]
        # the catalog lists LIVE entries; the tombstoned row stays in its
        # segment as a dead index
        assert cur["ok"] and cur["entries"] == 5
        assert sum(t["dead"] for t in cur["tiers"].values()) == 1
        assert r["generations"]["bak"]["ok"] is True
        assert r["orphans"]["count"] == 0
        assert r["deep"]["ok"] and r["deep"]["entries"] == 5  # dead dropped

    def test_missing_segment_detected(self, checkpoint):
        cat = json.load(open(os.path.join(checkpoint, CATALOG_FILE)))
        fname = next(iter(cat["tiers"].values()))[0][0]
        os.remove(os.path.join(checkpoint, fname))
        r = fsck_checkpoint(checkpoint)
        assert r["ok"] is False
        assert any("missing" in e
                   for e in r["generations"]["current"]["errors"])

    def test_truncated_segment_detected(self, checkpoint):
        cat = json.load(open(os.path.join(checkpoint, CATALOG_FILE)))
        fname = next(iter(cat["tiers"].values()))[0][0]
        path = os.path.join(checkpoint, fname)
        data = open(path, "rb").read()
        open(path, "wb").write(data[: len(data) // 2])  # torn write
        r = fsck_checkpoint(checkpoint)
        assert r["ok"] is False
        errs = r["generations"]["current"]["errors"]
        assert any("unreadable" in e or "shape" in e for e in errs)

    def test_corrupt_current_good_bak_not_ok(self, checkpoint):
        # a restart WOULD serve the .bak, but data since it is lost —
        # fsck must flag the directory, not bless the silent fallback
        open(os.path.join(checkpoint, CATALOG_FILE), "w").write("{broken")
        r = fsck_checkpoint(checkpoint, deep=True)
        assert r["ok"] is False
        assert r["generations"]["bak"]["ok"] is True
        assert r["deep"]["ok"] is True  # the fallback restore works

    def test_orphans_reported(self, checkpoint):
        np.save(os.path.join(checkpoint, "tier128_seg9.g99.npy"),
                np.zeros((1, 128, 2), np.float32))
        r = fsck_checkpoint(checkpoint)
        assert r["ok"] is True  # orphans are debris, not corruption
        assert r["orphans"]["count"] == 1 and r["orphans"]["bytes"] > 0

    def test_shape_mismatch_detected(self, checkpoint):
        cat = json.load(open(os.path.join(checkpoint, CATALOG_FILE)))
        fname = next(iter(cat["tiers"].values()))[0][0]
        with open(os.path.join(checkpoint, fname), "wb") as f:
            np.save(f, np.zeros((1, 4, 2), np.float32))
        r = fsck_checkpoint(checkpoint)
        assert r["ok"] is False
        assert any("shape" in e
                   for e in r["generations"]["current"]["errors"])


class TestFsckCli:
    def test_cli_ok_and_bad(self, checkpoint, tmp_path, capsys):
        from tiresias_tpu.cli import main

        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={os.path.dirname(checkpoint)}\n"
        )
        assert main(["-c", str(conf), "fsck", "--deep"]) == 0
        out = capsys.readouterr().out
        assert "current  OK" in out and "deep     OK" in out
        # break it
        cat = json.load(open(os.path.join(checkpoint, CATALOG_FILE)))
        fname = next(iter(cat["tiers"].values()))[0][0]
        os.remove(os.path.join(checkpoint, fname))
        assert main(["-c", str(conf), "fsck"]) == 1
        out = capsys.readouterr().out
        assert "BAD" in out and "NOT OK" in out


class TestFsckRobustness:
    """Malformed-but-parseable catalogs are findings, not crashes."""

    @pytest.mark.parametrize(
        "payload",
        [
            "[1, 2]",  # top-level list
            '{"version": 4, "gen": 1, "contexts": {}, "entries": [],'
            ' "tiers": {"abc": []}}',  # non-numeric tier key
            '{"version": 4, "gen": 1, "contexts": {}, "entries": [],'
            ' "tiers": {"128": 5}}',  # tiers value not a list
            '{"version": 4, "gen": 1, "contexts": {}, "entries": [],'
            ' "tiers": {"128": [["f.npy", "xx"]]}}',  # garbage row count
            '{"version": 4, "gen": 1, "contexts": {}, "entries": [],'
            ' "tiers": {}, "dead": 7}',  # dead not an object
        ],
    )
    def test_malformed_catalog_reports_bad(self, tmp_path, payload):
        d = tmp_path / "checkpoint"
        d.mkdir()
        (d / CATALOG_FILE).write_text(payload)
        r = fsck_checkpoint(str(d))
        assert r["ok"] is False
        cur = r["generations"]["current"]
        assert cur["errors"], "malformed catalog must produce findings"

    def test_configured_coefs_mismatch_flagged(self, checkpoint):
        # checkpoint stores n_coefs=2; a deployment configured for 8
        # would refuse at startup — fsck must say so, both structurally
        # and in the deep restore
        r = fsck_checkpoint(checkpoint, deep=True, n_coefs=8)
        assert r["ok"] is False
        assert any("n_coefs" in e
                   for e in r["generations"]["current"]["errors"])
        assert r["deep"]["ok"] is False

    def test_cli_warns_on_live_owner(self, checkpoint, tmp_path, capsys):
        from tiresias_tpu.cli import main
        from tiresias_tpu.utils.locking import DataDirLock

        data_dir = os.path.dirname(checkpoint)
        conf = tmp_path / "t.conf"
        conf.write_text(f"[global]\ndata_dir={data_dir}\n")
        lock = DataDirLock(data_dir).acquire()
        try:
            assert main(["-c", str(conf), "fsck"]) == 0
            assert "owned by a live process" in capsys.readouterr().err
        finally:
            lock.release()
        assert main(["-c", str(conf), "fsck"]) == 0
        assert "owned by a live process" not in capsys.readouterr().err
