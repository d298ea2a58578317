"""Live admin plane + single-writer data-dir ownership (round-3 item 1).

The reference's CLI executes inside the live module process against its
in-memory DB (/root/reference/src/cli_handler.c:26-31). Here: a running
server owns the data dir (flock), exposes CRUD/sync over its protocol, and
an offline CLI auto-detects it and proxies — while a second offline writer
fails loudly instead of racing the checkpoints.
"""

import asyncio
import os
import threading

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import ContextConfig, MatchConfig, TiresiasConfig
from tiresias_tpu.serve.admin import AdminClient, connect_for_data_dir
from tiresias_tpu.serve.server import RecognitionServer
from tiresias_tpu.utils.audio import synth_tone, write_wav
from tiresias_tpu.utils.locking import (
    DataDirLock,
    DataDirLocked,
    read_server_info,
)

SR = 8000


@pytest.fixture()
def served(tmp_path):
    """A running server owning a data dir with one synced context."""
    media = tmp_path / "media"
    media.mkdir()
    for i in range(3):
        write_wav(str(media / f"tone{i}.wav"), synth_tone(300 + 200 * i, 1.0, SR), SR)
    config = TiresiasConfig(
        contexts=(ContextConfig("m", str(media)),),
        match=MatchConfig(coefs=2, tolerance=0.01, trunc_coef1=False),
        data_dir=str(tmp_path / "data"),
    )
    eng = Tiresias(config, restore=False, exclusive=True)
    eng.sync()
    started = threading.Event()
    holder = {}

    def runner():
        async def main():
            srv = RecognitionServer(eng, port=0, samplerate=SR)
            await srv.start()
            holder["server"] = srv
            holder["loop"] = asyncio.get_running_loop()
            started.set()
            try:
                await srv.serve_forever()
            except asyncio.CancelledError:
                pass

        asyncio.run(main())

    thread = threading.Thread(target=runner, daemon=True)
    thread.start()
    assert started.wait(10)
    yield holder["server"], eng, config, media
    asyncio.run_coroutine_threadsafe(
        holder["server"].stop(), holder["loop"]
    ).result(timeout=10)


class TestLock:
    def test_exclusive_engine_rejects_second_writer(self, tmp_path):
        cfg = TiresiasConfig(data_dir=str(tmp_path))
        eng = Tiresias(cfg, restore=False, exclusive=True)
        with pytest.raises(DataDirLocked):
            Tiresias(cfg, restore=False, exclusive=True)
        eng.close()
        # released on close — a new writer may take over
        eng2 = Tiresias(cfg, restore=False, exclusive=True)
        eng2.close()

    def test_default_engine_falls_back_readonly(self, tmp_path):
        cfg = TiresiasConfig(data_dir=str(tmp_path))
        owner = Tiresias(cfg, restore=False, exclusive=True)
        ro = Tiresias(cfg, restore=False)  # default: degrade, don't raise
        assert not ro.lock.held
        with pytest.raises(DataDirLocked):
            ro.save()
        with pytest.raises(DataDirLocked):
            ro.sync()
        owner.close()

    def test_lock_info_names_owner(self, tmp_path):
        lock = DataDirLock(str(tmp_path)).acquire()
        other = DataDirLock(str(tmp_path))
        with pytest.raises(DataDirLocked) as exc_info:
            other.acquire()
        assert exc_info.value.owner.get("pid") == os.getpid()
        lock.release()
        # after release the dir is free again
        other.acquire()
        other.release()


class TestAdminProtocol:
    def test_show_and_remove_on_live_store(self, served):
        server, eng, config, media = served
        with AdminClient("127.0.0.1", server.port) as client:
            contexts = client.admin("show_contexts")["contexts"]
            assert [c["name"] for c in contexts] == ["m"]
            audios = client.admin("show_audios", context="m")["audios"]
            assert len(audios) == 3
            victim = audios[0]
            assert client.admin("remove_audio", uuid=victim["uuid"])["removed"]
            # the LIVE store changed (no restart, no reload)
            assert eng.get_audio(victim["uuid"]) is None
            assert len(eng.store) == 2
            # and the mutation was checkpointed by the owning engine
            fresh = Tiresias(config, exclusive=False)
            assert len(fresh.store) == 2
            # removing again reports failure, not an exception
            assert not client.admin("remove_audio", uuid=victim["uuid"])["removed"]

    def test_sync_picks_up_new_files(self, served):
        server, eng, config, media = served
        write_wav(str(media / "new.wav"), synth_tone(950, 1.0, SR), SR)
        with AdminClient("127.0.0.1", server.port) as client:
            report = client.admin("sync", context="m")["sync"]
            assert report["created"] == 1
            names = [
                a["name"] for a in client.admin("show_audios", context="m")["audios"]
            ]
        assert "new.wav" in names
        # the new audio is immediately searchable on the live engine
        r = eng.search_pcm("m", synth_tone(950, 1.0, SR), SR)
        assert r.found and r.name == "new.wav"

    def test_remove_context_and_unknown_cmd(self, served):
        server, eng, config, media = served
        with AdminClient("127.0.0.1", server.port) as client:
            assert client.admin("remove_context", context="m")["removed"]
            assert eng.store.get_context("m") is None
            from tiresias_tpu.serve.admin import AdminError

            with pytest.raises(AdminError):
                client.admin("frobnicate")

    def test_offline_writer_rejected_while_serving(self, served):
        server, eng, config, media = served
        with pytest.raises(DataDirLocked):
            Tiresias(config, exclusive=True)
        ro = Tiresias(config, exclusive=False)
        with pytest.raises(DataDirLocked):
            ro.save()

    def test_server_info_lifecycle(self, served, tmp_path):
        server, eng, config, media = served
        info = read_server_info(config.expanded_data_dir)
        assert info and info["port"] == server.port
        client = connect_for_data_dir(config.expanded_data_dir)
        assert client is not None
        client.close()
        # a dir nobody owns reports no server even with a stale file
        stale = tmp_path / "stale"
        stale.mkdir()
        (stale / "server.json").write_text('{"host": "127.0.0.1", "port": 1}')
        assert read_server_info(str(stale)) is None


class TestCliProxy:
    def test_cli_remove_proxies_to_live_server(self, served, capsys, tmp_path):
        server, eng, config, media = served
        import json as _json

        from tiresias_tpu import cli

        conf_path = tmp_path / "tiresias.conf"
        conf_path.write_text(
            f"[global]\ndata_dir={config.data_dir}\n"
            f"[m]\ndirectory={media}\n"
        )
        victim = eng.get_audios("m")[0]
        rc = cli.main(["-c", str(conf_path), "remove", "audio", victim.uuid])
        out = capsys.readouterr().out
        assert rc == 0
        assert f"Removed the audio info. uuid[{victim.uuid}]" in out
        assert eng.get_audio(victim.uuid) is None  # live store mutated

    def test_cli_show_audios_proxies(self, served, capsys, tmp_path):
        server, eng, config, media = served
        from tiresias_tpu import cli

        conf_path = tmp_path / "tiresias.conf"
        conf_path.write_text(
            f"[global]\ndata_dir={config.data_dir}\n"
            f"[m]\ndirectory={media}\n"
        )
        rc = cli.main(["-c", str(conf_path), "show", "audios", "m"])
        out = capsys.readouterr().out
        assert rc == 0
        for a in eng.get_audios("m"):
            assert a.uuid in out


class TestAdminGating:
    def test_admin_off_rejects(self, tmp_path):
        config = TiresiasConfig(data_dir=str(tmp_path / "d"))
        eng = Tiresias(config, restore=False, exclusive=True)
        eng.create_context("m")
        started = threading.Event()
        holder = {}

        def runner():
            async def main():
                srv = RecognitionServer(eng, port=0, samplerate=SR, admin="off")
                await srv.start()
                holder["server"] = srv
                holder["loop"] = asyncio.get_running_loop()
                started.set()
                try:
                    await srv.serve_forever()
                except asyncio.CancelledError:
                    pass

            asyncio.run(main())

        threading.Thread(target=runner, daemon=True).start()
        assert started.wait(10)
        from tiresias_tpu.serve.admin import AdminError

        with AdminClient("127.0.0.1", holder["server"].port) as client:
            with pytest.raises(AdminError, match="not permitted"):
                client.admin("show_contexts")
        asyncio.run_coroutine_threadsafe(
            holder["server"].stop(), holder["loop"]
        ).result(timeout=10)

    def test_admin_local_allows_loopback(self, served):
        server, eng, config, media = served  # default admin="local"
        with AdminClient("127.0.0.1", server.port) as client:
            assert "contexts" in client.admin("show_contexts")

    def test_bad_admin_mode_rejected(self, tmp_path):
        eng = Tiresias(
            TiresiasConfig(data_dir=str(tmp_path / "e")), restore=False
        )
        with pytest.raises(ValueError):
            RecognitionServer(eng, admin="everyone")


class TestLockStaleContent:
    def test_acquire_survives_probe_race_on_stale_content(self, tmp_path):
        """A crashed owner leaves its JSON in owner.lock (truncation only
        happens on clean release); a momentary shared-lock liveness probe
        must not turn that stale content into a spurious DataDirLocked."""
        import json
        import threading
        import time

        from tiresias_tpu.utils.locking import DataDirLock

        d = str(tmp_path)
        lock_path = tmp_path / "owner.lock"
        lock_path.write_text(json.dumps({"pid": 999999}))  # stale content

        import fcntl

        probe_fd = lock_path.open("r")
        fcntl.flock(probe_fd.fileno(), fcntl.LOCK_SH)  # momentary probe
        result = {}

        def acquirer():
            lk = DataDirLock(d)
            try:
                lk.acquire()
                result["held"] = lk.held
            finally:
                lk.release()

        t = threading.Thread(target=acquirer)
        t.start()
        time.sleep(0.08)  # inside the retry window
        fcntl.flock(probe_fd.fileno(), fcntl.LOCK_UN)
        probe_fd.close()
        t.join(10)
        assert result.get("held") is True


class TestLockHygiene:
    def test_failed_init_releases_lock(self, tmp_path):
        """An unreadable checkpoint must not leave the data-dir flock held
        by the failed construction: flock treats fds independently, so a
        same-process retry after repairing the checkpoint would otherwise
        be locked out by its own leaked fd until process exit."""
        from tiresias_tpu.store.fingerprint_store import CheckpointUnreadable

        ckpt = tmp_path / "checkpoint"
        ckpt.mkdir()
        (ckpt / "catalog.json").write_text("{not json")
        cfg = TiresiasConfig(data_dir=str(tmp_path))
        with pytest.raises(CheckpointUnreadable):
            Tiresias(cfg, exclusive=True)
        (ckpt / "catalog.json").unlink()  # operator repairs the damage
        eng = Tiresias(cfg, exclusive=True)  # same process, must succeed
        assert eng.lock.held
        eng.close()

    def test_server_info_flock_unsupported_falls_back_to_pid(
        self, tmp_path, monkeypatch
    ):
        """Where flock raises ENOLCK, acquire() degrades to advisory
        success on the SAME filesystem — so read_server_info answering
        'no server' there would re-enable the two-writer checkpoint race.
        It must fall back to pid liveness instead."""
        import errno
        import fcntl
        import json
        import subprocess

        from tiresias_tpu.utils.locking import write_server_info

        DataDirLock(str(tmp_path)).acquire().release()  # lock file exists

        def no_flock(fd, op):
            raise OSError(errno.ENOLCK, "No locks available")

        monkeypatch.setattr(fcntl, "flock", no_flock)
        write_server_info(str(tmp_path), "127.0.0.1", 4242)  # pid: ours
        info = read_server_info(str(tmp_path))
        assert info is not None and info["port"] == 4242
        # a DEAD writer's advertisement is still distrusted
        p = subprocess.Popen(["sleep", "0"])
        p.wait()
        (tmp_path / "server.json").write_text(
            json.dumps({"host": "127.0.0.1", "port": 4242, "pid": p.pid})
        )
        assert read_server_info(str(tmp_path)) is None


class TestBakFallbackFollow:
    def test_bak_fallback_does_not_reload_every_poll(self, tmp_path):
        """A replica restored from .bak (damaged current generation) must
        record the newest generation it OBSERVED: comparing polls against
        its save generation (deliberately 0 after a fallback) would
        re-deserialize the same checkpoint on every follow tick forever."""
        import json

        media = tmp_path / "media"
        media.mkdir()
        write_wav(str(media / "a.wav"), synth_tone(440, 1.0, SR), SR)
        config = TiresiasConfig(
            contexts=(ContextConfig("m", str(media)),),
            data_dir=str(tmp_path / "data"),
        )
        owner = Tiresias(config, exclusive=True)
        owner.sync()  # generation 1: a.wav
        write_wav(str(media / "b.wav"), synth_tone(900, 1.0, SR), SR)
        owner.sync()  # generation 2: + b.wav
        owner.close()
        ckpt = tmp_path / "data" / "checkpoint"
        cur = json.loads((ckpt / "catalog.json").read_text())
        bak = json.loads((ckpt / "catalog.json.bak").read_text())
        assert cur["gen"] > bak["gen"]
        # damage the CURRENT generation only: its catalog stays parseable
        # (so follow polls read gen N) but a segment it lists is gone
        tier = next(iter(cur["tiers"]))
        cur["tiers"][tier] = [["vanished.npy", 1]]
        (ckpt / "catalog.json").write_text(json.dumps(cur))
        replica = Tiresias(config, exclusive=False)
        assert len(replica.store) == len(bak["entries"])  # .bak fallback
        assert replica.store._save_gen == 0  # never reuse gen-N files
        assert replica.store._restored_gen == bak["gen"]
        assert replica.store._seen_gen == cur["gen"]
        # the poll sees nothing newer than what load already observed
        assert replica.refresh_from_checkpoint() is False
        replica.close()


class TestNonOwnerServerStop:
    def test_readonly_server_stop_preserves_owner_advertisement(
        self, tmp_path
    ):
        """A read-only server instance must not delete the live owner's
        server.json on stop — the CLI's proxy detection depends on it."""
        from tiresias_tpu.utils.locking import write_server_info

        cfg = TiresiasConfig(data_dir=str(tmp_path))
        owner = Tiresias(cfg, restore=False, exclusive=True)
        write_server_info(str(tmp_path), "127.0.0.1", 12345)
        ro = Tiresias(cfg, restore=False)  # degrades to read-only
        assert not ro.lock.held

        async def run():
            srv = RecognitionServer(ro, port=0)
            await srv.start()
            await srv.stop()

        asyncio.run(run())
        assert os.path.exists(os.path.join(str(tmp_path), "server.json"))
        owner.close()


class TestServerInfoIdentity:
    """server.json is trusted only while the process that WROTE it holds
    the lock (pid cross-check) — a crashed server's leftover address must
    not be proxied to when an unrelated process owns the dir (the port may
    have been reused by a server on a DIFFERENT data dir)."""

    def test_other_lock_holder_means_stale(self, tmp_path):
        import json

        d = str(tmp_path)
        from tiresias_tpu.utils.locking import write_server_info

        write_server_info(d, "127.0.0.1", 8517)
        p = tmp_path / "server.json"
        info = json.loads(p.read_text())
        info["pid"] = 999_999_999  # the (crashed) server's pid, not ours
        p.write_text(json.dumps(info))
        lock = DataDirLock(d).acquire()  # WE hold the lock now
        try:
            assert read_server_info(d) is None
        finally:
            lock.release()

    def test_matching_pid_holder_trusted(self, tmp_path):
        d = str(tmp_path)
        from tiresias_tpu.utils.locking import write_server_info

        lock = DataDirLock(d).acquire()
        write_server_info(d, "127.0.0.1", 1234)  # records OUR pid
        try:
            info = read_server_info(d)
            assert info and info["port"] == 1234
        finally:
            lock.release()

    def test_garbled_server_json_falls_back(self, tmp_path):
        import json

        d = str(tmp_path)
        lock = DataDirLock(d).acquire()
        (tmp_path / "server.json").write_text(
            json.dumps({"host": "127.0.0.1", "port": "abc", "pid": os.getpid()})
        )
        try:
            assert connect_for_data_dir(d) is None  # no crash, no proxy
        finally:
            lock.release()


class TestReadOnlyListingFallback:
    def test_show_contexts_falls_back_when_admin_off(self, tmp_path, capsys):
        """`tiresias show contexts` against a server running --admin off
        must list from the catalog instead of exiting 1 (review finding:
        read-only commands hard-failed on the admin gate)."""
        media = tmp_path / "media"
        media.mkdir()
        write_wav(str(media / "a.wav"), synth_tone(440, 0.8, SR), SR)
        config = TiresiasConfig(
            contexts=(ContextConfig("m", str(media)),),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(config, restore=False, exclusive=True)
        eng.sync()  # checkpoints -> catalog exists for the offline read
        started = threading.Event()
        holder = {}

        def runner():
            async def main():
                srv = RecognitionServer(eng, port=0, samplerate=SR, admin="off")
                await srv.start()
                holder["server"], holder["loop"] = (
                    srv, asyncio.get_running_loop(),
                )
                started.set()
                try:
                    await srv.serve_forever()
                except asyncio.CancelledError:
                    pass

            asyncio.run(main())

        threading.Thread(target=runner, daemon=True).start()
        assert started.wait(10)
        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={tmp_path / 'data'}\n\n"
            f"[m]\ndirectory={media}\n"
        )
        try:
            from tiresias_tpu import cli

            rc = cli.main(["-c", str(conf), "show", "contexts"])
            out = capsys.readouterr().out
            assert rc == 0 and any(
                line.startswith("m ") for line in out.splitlines()
            )
            rc = cli.main(["-c", str(conf), "show", "audios", "m"])
            out = capsys.readouterr().out
            assert rc == 0 and "a.wav" in out
        finally:
            asyncio.run_coroutine_threadsafe(
                holder["server"].stop(), holder["loop"]
            ).result(timeout=10)
            eng.close()


class TestLiveSearch:
    def test_admin_search_op_over_protocol(self, served):
        """One-shot recognition against the RUNNING server's store — the
        dialplan app's operational model (application_handler.c:180)
        without a per-invocation cold restore."""
        import base64

        server, eng, config, media = served
        pcm = synth_tone(500, 1.0, SR)
        i16 = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype("<i2")
        with AdminClient("127.0.0.1", server.port) as client:
            reply = client.admin(
                "search", context="m",
                pcm=base64.b64encode(i16.tobytes()).decode(),
                samplerate=SR,
            )
        result = reply["result"]
        assert result["TIRSTATUS"] == "FOUND"
        assert result["TIRFILENAME"] == "tone1.wav"
        assert "CONFIDENCE" in result

    def test_admin_search_top_over_protocol(self, served):
        """Ranked --top listings answered from the RUNNING server's store;
        bad tops are clean protocol errors, not crashes."""
        import base64

        from tiresias_tpu.serve.admin import AdminError

        server, eng, config, media = served
        pcm = synth_tone(500, 1.0, SR)
        i16 = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype("<i2")
        b64 = base64.b64encode(i16.tobytes()).decode()
        with AdminClient("127.0.0.1", server.port) as client:
            reply = client.admin(
                "search", context="m", pcm=b64, samplerate=SR, top=3,
            )
            ranked = reply["ranked"]  # strict config: only tone1 matches
            assert ranked and ranked[0]["TIRFILENAME"] == "tone1.wav"
            votes = [int(p["TIRMATCHCOUNT"]) for p in ranked]
            assert votes == sorted(votes, reverse=True) and votes[0] > 0
            assert all("CONFIDENCE" in p for p in ranked)
            # a true tie ranks by insertion (D5): all three tones tie at
            # tolerance 1.0, so the full table lists them in synced order
            reply = client.admin(
                "search", context="m", pcm=b64, samplerate=SR,
                tolerance=1.0, top=3,
            )
            names = [p["TIRFILENAME"] for p in reply["ranked"]]
            assert names == ["tone0.wav", "tone1.wav", "tone2.wav"]
            for bad in (0, -2, "3", True, 4096):
                with pytest.raises(AdminError):
                    client.admin(
                        "search", context="m", pcm=b64, samplerate=SR,
                        top=bad,
                    )
            with pytest.raises(AdminError):  # top + batched queries
                client.admin(
                    "search", context="m", top=2,
                    queries=[{"pcm": b64, "samplerate": SR}],
                )

    def test_cli_top_proxies_to_live_server(
        self, served, capsys, tmp_path, monkeypatch
    ):
        """`tiresias search --top N` must answer from the live store too
        (a cold restore per listing defeats the admin plane at scale)."""
        from tiresias_tpu import cli
        from tiresias_tpu.utils.audio import write_wav

        server, eng, config, media = served
        query = tmp_path / "q.wav"
        write_wav(str(query), synth_tone(700, 1.0, SR), SR)
        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={config.data_dir}\ncoefs=2\n"
            f"tolerance=0.01\ntrunc_coef1=no\n\n[m]\ndirectory={media}\n"
        )

        def no_engine(*a, **k):
            raise AssertionError("offline engine built despite live server")

        monkeypatch.setattr(cli, "_engine", no_engine)
        rc = cli.main(
            ["-c", str(conf), "search", "--top", "2", "m", str(query)]
        )
        out = capsys.readouterr().out
        assert rc == 0
        lines = [ln for ln in out.splitlines() if ln.strip()]
        assert lines[0].startswith("Rank")
        # strict tolerance: only the 700 Hz tone scores -> one table row
        assert len(lines) == 2 and "tone2.wav" in lines[1]

    def test_cli_search_proxies_to_live_server(
        self, served, capsys, tmp_path, monkeypatch
    ):
        """`tiresias search` must run against the live store when a server
        owns the data dir (and never build a second engine)."""
        from tiresias_tpu import cli
        from tiresias_tpu.utils.audio import write_wav

        server, eng, config, media = served
        query = tmp_path / "q.wav"
        write_wav(str(query), synth_tone(700, 1.0, SR), SR)
        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={config.data_dir}\ncoefs=2\n"
            f"tolerance=0.01\ntrunc_coef1=no\n\n[m]\ndirectory={media}\n"
        )

        def no_engine(*a, **k):
            raise AssertionError("offline engine built despite live server")

        monkeypatch.setattr(cli, "_engine", no_engine)
        rc = cli.main(["-c", str(conf), "search", "m", str(query)])
        out = capsys.readouterr().out
        assert rc == 0
        assert "TIRSTATUS=FOUND" in out and "tone2.wav" in out
        assert "CONFIDENCE=" in out

    def test_cli_multi_file_search_proxies_to_live_server(
        self, served, capsys, tmp_path, monkeypatch
    ):
        """The batched table must use the same proxy rule as single-file
        search — an offline engine would answer from a stale checkpoint
        while the server holds un-checkpointed live audios."""
        from tiresias_tpu import cli
        from tiresias_tpu.utils.audio import write_wav

        server, eng, config, media = served
        q1 = tmp_path / "q1.wav"
        q2 = tmp_path / "q2.wav"
        write_wav(str(q1), synth_tone(700, 1.0, SR), SR)
        write_wav(str(q2), synth_tone(500, 1.0, SR), SR)
        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={config.data_dir}\ncoefs=2\n"
            f"tolerance=0.01\ntrunc_coef1=no\n\n[m]\ndirectory={media}\n"
        )

        def no_engine(*a, **k):
            raise AssertionError("offline engine built despite live server")

        monkeypatch.setattr(cli, "_engine", no_engine)
        rc = cli.main(["-c", str(conf), "search", "m", str(q1), str(q2)])
        out = capsys.readouterr().out
        assert rc == 0
        assert "tone2.wav" in out and "tone1.wav" in out
        lines = [ln for ln in out.splitlines() if ln.startswith("q")]
        assert len(lines) == 2 and all("FOUND" in ln for ln in lines)


class TestReplicaFollow:
    def test_replica_follows_owner_checkpoints(self, tmp_path):
        """An owner ingests and checkpoints; a read-only replica server
        polls the checkpoint, swaps in each committed generation, and
        answers searches for audios it never ingested itself."""
        import base64
        import time

        media = tmp_path / "media"
        media.mkdir()
        write_wav(str(media / "a.wav"), synth_tone(440, 1.0, SR), SR)
        config = TiresiasConfig(
            contexts=(ContextConfig("m", str(media)),),
            match=MatchConfig(coefs=2, tolerance=0.01, trunc_coef1=False),
            data_dir=str(tmp_path / "data"),
        )
        owner = Tiresias(config, exclusive=True)
        owner.sync()  # checkpoints a.wav
        replica = Tiresias(config, exclusive=False)
        assert not replica.lock.held
        started = threading.Event()
        holder = {}

        def runner():
            async def main():
                srv = RecognitionServer(
                    replica, port=0, samplerate=SR, follow_interval=0.2
                )
                await srv.start()
                holder["server"], holder["loop"] = (
                    srv, asyncio.get_running_loop(),
                )
                started.set()
                try:
                    await srv.serve_forever()
                except asyncio.CancelledError:
                    pass

            asyncio.run(main())

        threading.Thread(target=runner, daemon=True).start()
        assert started.wait(10)
        try:
            # the owner commits a NEW audio after the replica started
            write_wav(str(media / "b.wav"), synth_tone(900, 1.0, SR), SR)
            owner.sync()
            deadline = time.monotonic() + 15
            while time.monotonic() < deadline:
                if len(replica.store) == 2:
                    break
                time.sleep(0.1)
            assert len(replica.store) == 2, "replica never followed"
            # and the replica ANSWERS for the new audio over its socket
            import socket

            pcm = synth_tone(900, 1.0, SR)
            i16 = np.clip(
                np.round(pcm * 32768.0), -32768, 32767
            ).astype("<i2")
            with AdminClient(
                "127.0.0.1", holder["server"].port
            ) as client:
                reply = client.admin(
                    "search", context="m",
                    pcm=base64.b64encode(i16.tobytes()).decode(),
                    samplerate=SR,
                )
            assert reply["result"]["TIRFILENAME"] == "b.wav"
            # mutations on the replica are refused
            with AdminClient(
                "127.0.0.1", holder["server"].port
            ) as client:
                import pytest as _pytest

                from tiresias_tpu.serve.admin import AdminError

                with _pytest.raises(AdminError, match="read-only"):
                    client.admin("sync")
        finally:
            asyncio.run_coroutine_threadsafe(
                holder["server"].stop(), holder["loop"]
            ).result(timeout=10)
            replica.close()
            owner.close()

    def test_follow_mode_rejects_owner_engine(self, tmp_path):
        cfg = TiresiasConfig(data_dir=str(tmp_path / "d"))
        owner = Tiresias(cfg, restore=False, exclusive=True)
        try:
            with pytest.raises(ValueError, match="replica"):
                RecognitionServer(owner, port=0, follow_interval=1.0)
        finally:
            owner.close()


class TestAdminSearchF32:
    def test_f32_payload_matches_offline(self, served):
        """The CLI proxy ships float32 PCM so a proxied search is
        bit-identical to the offline one (int16 quantization could flip
        frames at a tolerance boundary)."""
        import base64

        server, eng, config, media = served
        pcm = synth_tone(700, 1.0, SR).astype("<f4")
        with AdminClient("127.0.0.1", server.port) as client:
            reply = client.admin(
                "search", context="m",
                pcm=base64.b64encode(pcm.tobytes()).decode(),
                dtype="f32", samplerate=SR,
            )
        offline = eng.search_pcm("m", pcm, SR)
        assert reply["result"]["TIRFILENAME"] == "tone2.wav"
        assert int(reply["result"]["TIRMATCHCOUNT"]) == offline.match_count


class TestStatsProxy:
    def test_cli_stats_proxies_to_live_server(
        self, served, capsys, tmp_path
    ):
        from tiresias_tpu import cli

        server, eng, config, media = served
        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={config.data_dir}\n\n[m]\ndirectory={media}\n"
        )
        rc = cli.main(["-c", str(conf), "stats"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "audios: 3" in out and "owner: True" in out
        assert "generation:" in out


class TestReload:
    """Live config reload (admin 'reload' / SIGHUP): the reference
    declines reload outright (/root/reference/src/app_tiresias.c:608-614)."""

    def _server_with_conf(self, tmp_path):
        media_a = tmp_path / "a"
        media_a.mkdir()
        write_wav(str(media_a / "t.wav"), synth_tone(400, 1.0, SR), SR)
        conf = tmp_path / "t.conf"

        def write_conf(extra="", global_extra=""):
            conf.write_text(
                "[global]\n"
                f"data_dir={tmp_path / 'data'}\n" + global_extra
                + f"[ctx_a]\ndirectory={media_a}\n" + extra
            )

        write_conf()
        from tiresias_tpu.config import load_config

        cfg = load_config(str(conf))
        eng = Tiresias(cfg, restore=False, exclusive=True)
        eng.sync()
        started = threading.Event()
        holder = {}

        def runner():
            async def main():
                srv = RecognitionServer(
                    eng, port=0, samplerate=SR,
                    reload_config=lambda: load_config(str(conf)),
                )
                await srv.start()
                holder["server"] = srv
                holder["loop"] = asyncio.get_running_loop()
                started.set()
                try:
                    await srv.serve_forever()
                except asyncio.CancelledError:
                    pass

            asyncio.run(main())

        threading.Thread(target=runner, daemon=True).start()
        assert started.wait(10)
        return holder, eng, tmp_path, write_conf

    def test_reload_adopts_new_context(self, tmp_path):
        holder, eng, root, write_conf = self._server_with_conf(tmp_path)
        try:
            media_b = root / "b"
            media_b.mkdir()
            write_wav(str(media_b / "n.wav"), synth_tone(700, 1.0, SR), SR)
            write_conf(extra=f"[ctx_b]\ndirectory={media_b}\n")
            with AdminClient("127.0.0.1", holder["server"].port) as cli:
                r = cli.admin("reload")
                assert r["reloaded"] is True
                assert set(r["contexts"]) == {"ctx_a", "ctx_b"}
                assert r["sync"]["created"] == 1
                # the new context's audio serves immediately
                rows = cli.admin("show_audios", context="ctx_b")["audios"]
                assert [a["name"] for a in rows] == ["n.wav"]
        finally:
            asyncio.run_coroutine_threadsafe(
                holder["server"].stop(), holder["loop"]
            ).result(timeout=10)

    def test_reload_rejects_dsp_change_and_keeps_serving(self, tmp_path):
        holder, eng, root, write_conf = self._server_with_conf(tmp_path)
        try:
            write_conf(global_extra="samplerate=16000\n")
            from tiresias_tpu.serve.admin import AdminError

            with AdminClient("127.0.0.1", holder["server"].port) as cli:
                with pytest.raises(AdminError, match="DSP"):
                    cli.admin("reload")
                # the old config keeps serving
                rows = cli.admin("show_audios", context="ctx_a")["audios"]
                assert len(rows) == 1
        finally:
            asyncio.run_coroutine_threadsafe(
                holder["server"].stop(), holder["loop"]
            ).result(timeout=10)


class TestReloadSafety:
    def test_vanished_conf_fails_reload_not_wipes(self, tmp_path):
        """A conf file that disappears must FAIL the reload — falling
        back to an empty default config would sync-delete every context
        (silent, checkpointed data loss)."""
        import argparse

        from tiresias_tpu.cli import _reload_config_fn

        conf = tmp_path / "t.conf"
        conf.write_text(f"[global]\ndata_dir={tmp_path/'d'}\n[c]\ndirectory=/x\n")
        fn = _reload_config_fn(argparse.Namespace(config=str(conf)))
        assert fn().contexts[0].name == "c"  # parses while present
        conf.unlink()
        with pytest.raises(FileNotFoundError, match="refusing to reload"):
            fn()

    def test_no_conf_at_startup_means_none(self, tmp_path, monkeypatch):
        import argparse

        from tiresias_tpu.cli import _reload_config_fn

        monkeypatch.chdir(tmp_path)  # no ./tiresias.conf on the search path
        monkeypatch.setenv("HOME", str(tmp_path))
        assert _reload_config_fn(argparse.Namespace(config=None)) is None

    def test_engine_reload_rolls_back_config_on_sync_failure(self, tmp_path):
        import dataclasses

        from tiresias_tpu.config import MatchConfig

        eng = Tiresias(
            TiresiasConfig(data_dir=str(tmp_path)), restore=False
        )
        try:
            old = eng.config
            new = dataclasses.replace(
                old, match=MatchConfig(tolerance=0.5)
            )

            def boom():
                raise RuntimeError("disk full")

            eng.sync = boom
            with pytest.raises(RuntimeError, match="disk full"):
                eng.reload(new)
            # the failed reload must not leave the NEW config active
            assert eng.config is old
        finally:
            del eng.sync
            eng.close()
