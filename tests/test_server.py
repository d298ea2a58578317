"""TCP recognition service: protocol round trip over a real socket."""

import asyncio
import base64
import json
import threading
import time

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import MatchConfig, TiresiasConfig
from tiresias_tpu.serve.server import RecognitionServer
from tiresias_tpu.utils.audio import synth_tone

SR = 8000


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    eng = Tiresias(
        TiresiasConfig(
            match=MatchConfig(coefs=2, tolerance=0.01, trunc_coef1=False),
            data_dir=str(tmp_path_factory.mktemp("srv")),
        ),
        restore=False,
    )
    eng.create_context("m")
    for i in range(4):
        # store the int16-quantized signal: DB audio and live queries pass
        # through the same 16-bit PCM path in production, and for sparse
        # spectra (pure tones) quantization noise dominates the empty mel
        # bands (PARITY.md §2 noise-floor note) — both sides must quantize
        pcm = synth_tone(300 + 200 * i, 2.0, SR)
        i16 = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16)
        eng.add_audio_pcm("m", f"tone{i}", i16.astype(np.float32) / 32768.0, SR)
    return eng


@pytest.fixture()
def server(engine):
    """RecognitionServer on an ephemeral port, its loop on a daemon thread."""
    started = threading.Event()
    holder = {}

    def runner():
        async def main():
            srv = RecognitionServer(engine, port=0, samplerate=SR)
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
    yield holder["server"]
    loop = holder["loop"]
    asyncio.run_coroutine_threadsafe(holder["server"].stop(), loop)


def _pcm_b64(pcm: np.ndarray) -> str:
    i16 = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype("<i2")
    return base64.b64encode(i16.tobytes()).decode()


def _talk(port, messages, expect_lines, timeout=30.0):
    import socket

    out = []
    with socket.create_connection(("127.0.0.1", port), timeout=timeout) as s:
        f = s.makefile("rw")
        for m in messages:
            f.write(json.dumps(m) + "\n")
        f.flush()
        for _ in range(expect_lines):
            out.append(json.loads(f.readline()))
    return out


class TestProtocol:
    def test_open_push_result(self, server):
        pcm = synth_tone(700, 1.2, SR)  # tone2
        msgs = [
            {"op": "open", "channel": "c1", "context": "m", "duration_ms": 1000},
            {"op": "pcm", "channel": "c1", "pcm": _pcm_b64(pcm)},
        ]
        replies = _talk(server.port, msgs, expect_lines=2)
        assert replies[0] == {"channel": "c1", "opened": True}
        result = replies[1]
        assert result["channel"] == "c1"
        assert result["result"]["TIRSTATUS"] == "FOUND"
        assert result["result"]["TIRFILENAME"] == "tone2"
        assert float(result["result"]["CONFIDENCE"]) > 0.9

    def test_hangup_before_duration(self, server):
        msgs = [
            {"op": "open", "channel": "x", "context": "m", "duration_ms": 3000},
            {"op": "pcm", "channel": "x", "pcm": _pcm_b64(synth_tone(300, 0.2, SR))},
            {"op": "hangup", "channel": "x"},
        ]
        replies = _talk(server.port, msgs, expect_lines=2)
        assert replies[1]["result"]["TIRSTATUS"] == "HANGUP"

    def test_bad_request_isolated(self, server):
        import socket

        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            f.write("this is not json\n")
            f.write(json.dumps({"op": "frobnicate", "channel": "y"}) + "\n")
            f.write(
                json.dumps(
                    {"op": "open", "channel": "y", "context": "m",
                     "duration_ms": 500}
                ) + "\n"
            )
            f.flush()
            r1 = json.loads(f.readline())
            r2 = json.loads(f.readline())
            r3 = json.loads(f.readline())
        assert "error" in r1 and "error" in r2
        assert r3 == {"channel": "y", "opened": True}

    def test_continuous_channel_gets_multiple_results(self, server):
        # review finding 2: the writer must survive the first result
        import socket

        pcm = synth_tone(700, 1.5, SR)
        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            f.write(json.dumps(
                {"op": "open", "channel": "cont", "context": "m",
                 "duration_ms": 500, "continuous": True}) + "\n")
            f.write(json.dumps(
                {"op": "pcm", "channel": "cont", "pcm": _pcm_b64(pcm)}) + "\n")
            f.flush()
            assert json.loads(f.readline())["opened"]
            first = json.loads(f.readline())
            second = json.loads(f.readline())
            assert first["result"]["TIRSTATUS"] == "FOUND"
            assert second["result"]["TIRSTATUS"] == "FOUND"
            f.write(json.dumps({"op": "hangup", "channel": "cont"}) + "\n")
            f.flush()

    def test_malformed_pcm_isolated(self, server):
        # review finding 8: bad base64 / missing pcm answers an error and
        # the connection (and its other channels) keeps working
        import socket

        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"op": "pcm", "channel": "x"}) + "\n")  # no pcm
            f.write(json.dumps(
                {"op": "pcm", "channel": "x", "pcm": "!!!notbase64"}) + "\n")
            f.write(json.dumps(
                {"op": "open", "channel": "ok", "context": "m",
                 "duration_ms": 400}) + "\n")
            f.write(json.dumps(
                {"op": "pcm", "channel": "ok",
                 "pcm": _pcm_b64(synth_tone(300, 0.5, SR))}) + "\n")
            f.flush()
            r1 = json.loads(f.readline())
            r2 = json.loads(f.readline())
            r3 = json.loads(f.readline())
            r4 = json.loads(f.readline())
        assert "error" in r1 and "error" in r2
        assert r3 == {"channel": "ok", "opened": True}
        assert r4["result"]["TIRSTATUS"] == "FOUND"

    def test_echo_op(self, server):
        """Liveness/RTT probe: inline reply, no scorer, no device —
        the TCP-floor term of the bench's latency decomposition."""
        replies = _talk(server.port, [{"op": "echo", "payload": "ping"}], 1)
        assert replies[0] == {"echo": "ping"}
        replies = _talk(server.port, [{"op": "echo"}], 1)
        assert replies[0] == {"echo": ""}

    def test_stats_op(self, server):
        replies = _talk(server.port, [{"op": "stats", "channel": ""}], 1)
        stats = replies[0]["stats"]
        assert stats["audios"] == 4
        assert "counters" in stats and "channels" in stats
        # generation/owner let an operator confirm replica catch-up
        assert stats["generation"] >= 0 and stats["owner"] in (True, False)

    def test_two_clients_same_channel_name(self, server):
        pcm_a = synth_tone(300, 0.7, SR)  # tone0
        pcm_b = synth_tone(900, 0.7, SR)  # tone3
        import socket

        conns = []
        for pcm in (pcm_a, pcm_b):
            s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
            f = s.makefile("rw")
            f.write(json.dumps(
                {"op": "open", "channel": "dup", "context": "m",
                 "duration_ms": 500}) + "\n")
            f.write(json.dumps(
                {"op": "pcm", "channel": "dup", "pcm": _pcm_b64(pcm)}) + "\n")
            f.flush()
            conns.append((s, f))
        names = []
        for s, f in conns:
            assert json.loads(f.readline())["opened"]
            names.append(json.loads(f.readline())["result"]["TIRFILENAME"])
            s.close()
        assert names == ["tone0", "tone3"]  # connection-scoped channels


class TestWarmupBatchSizes:
    def test_covers_every_scorer_bucket(self):
        """VERDICT round-1 item 9: run_server must warm every power-of-two
        batch shape the scorer can pad a tick to."""
        from tiresias_tpu.serve.server import warmup_batch_sizes

        assert warmup_batch_sizes(128) == (1, 2, 4, 8, 16, 32, 64, 128)
        assert warmup_batch_sizes(1) == (1,)
        # non-power-of-two cap: the scorer pads 100 channels to 128
        assert warmup_batch_sizes(100) == (1, 2, 4, 8, 16, 32, 64, 128)


class TestHangupRaces:
    def test_last_frame_then_hangup_gets_result(self, server):
        """Client sends a full window then hangs up immediately: whichever
        side wins (the 20 ms scorer tick or the hangup op), a real result
        must arrive — never silence, never HANGUP."""
        for trial in range(4):
            pcm = synth_tone(500, 1.0, SR)  # tone1, exactly one window
            msgs = [
                {"op": "open", "channel": f"r{trial}", "context": "m",
                 "duration_ms": 1000},
                {"op": "pcm", "channel": f"r{trial}", "pcm": _pcm_b64(pcm)},
                {"op": "hangup", "channel": f"r{trial}"},
            ]
            replies = _talk(server.port, msgs, expect_lines=2, timeout=30.0)
            assert replies[1]["result"]["TIRSTATUS"] == "FOUND", replies
            assert replies[1]["result"]["TIRFILENAME"] == "tone1"

    def test_scorer_wins_interleaving_still_delivers(self, server, monkeypatch):
        """Force the scorer-takes-the-window-first interleaving by slowing
        process_ready: the hangup op must not pop the writer out from under
        the in-flight search."""
        import time as _time

        rec = server.recognizer
        real = rec.process_ready

        def slow_process_ready():
            out = real()
            if out:
                _time.sleep(0.3)  # hold the result while the hangup lands
            return out

        monkeypatch.setattr(rec, "process_ready", slow_process_ready)
        import socket

        pcm = synth_tone(700, 1.0, SR)  # tone2
        with socket.create_connection(("127.0.0.1", server.port), timeout=30.0) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"op": "open", "channel": "sw", "context": "m",
                                "duration_ms": 1000}) + "\n")
            f.write(json.dumps({"op": "pcm", "channel": "sw",
                                "pcm": _pcm_b64(pcm)}) + "\n")
            f.flush()
            assert json.loads(f.readline())["opened"] is True
            _time.sleep(0.15)  # let the scorer tick take the window
            f.write(json.dumps({"op": "hangup", "channel": "sw"}) + "\n")
            f.flush()
            result = json.loads(f.readline())
            assert result["result"]["TIRSTATUS"] == "FOUND", result
            assert result["result"]["TIRFILENAME"] == "tone2"


class TestProtocolBounds:
    """Robustness bounds on untrusted clients (VERDICT r2 item 7)."""

    def test_duration_cap_rejected(self, server):
        replies = _talk(
            server.port,
            [{"op": "open", "channel": "big", "context": "m",
              "duration_ms": 3_600_000}],
            expect_lines=1,
        )
        assert "error" in replies[0]
        assert "duration_ms" in replies[0]["error"]

    def test_buffer_overflow_rejected_connection_survives(self, server):
        import socket

        # duration 1000 ms -> cap = 2*8000 + 30*8000 = 256000 samples;
        # one 40 s push (320000 samples) must be rejected outright
        big = _pcm_b64(np.zeros(40 * SR, dtype=np.float32))
        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"op": "open", "channel": "ov", "context": "m",
                                "duration_ms": 1000, "continuous": True,
                                "hop_ms": 500}) + "\n")
            f.flush()
            assert json.loads(f.readline())["opened"] is True
            f.write(json.dumps({"op": "pcm", "channel": "ov", "pcm": big}) + "\n")
            f.flush()
            reply = json.loads(f.readline())
            assert "error" in reply and "overflow" in reply["error"]
            # the connection is still usable after the rejected push
            f.write(json.dumps({"op": "open", "channel": "ok", "context": "m",
                                "duration_ms": 500}) + "\n")
            f.flush()
            assert json.loads(f.readline()) == {"channel": "ok", "opened": True}

    def test_unknown_channel_hangup_answers(self, server):
        replies = _talk(
            server.port,
            [{"op": "hangup", "channel": "never-opened"}],
            expect_lines=1,
        )
        assert "error" in replies[0]
        assert "unknown channel" in replies[0]["error"]

    def test_hangup_releases_writer_mapping(self, server):
        """Per-call channels on a LONG-LIVED connection must not leak
        writer/epoch entries: the deferred post-hangup release frees them
        once in-flight score passes drain (review finding: before this,
        nothing freed a hung-up channel until disconnect)."""
        import socket

        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            for i in range(5):
                f.write(json.dumps({"op": "open", "channel": f"call-{i}",
                                    "context": "m", "duration_ms": 3000})
                        + "\n")
                f.write(json.dumps({"op": "hangup", "channel": f"call-{i}"})
                        + "\n")
                f.flush()
                assert json.loads(f.readline())["opened"] is True
                assert (
                    json.loads(f.readline())["result"]["TIRSTATUS"] == "HANGUP"
                )
            # the connection stays up; the per-call entries drain away
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline:
                if not server._writers and not server._chan_epoch:
                    break
                time.sleep(0.05)
            assert not server._writers, server._writers
            assert not server._chan_epoch, server._chan_epoch

    def test_line_too_long_answers_and_closes(self, server):
        import socket

        from tiresias_tpu.serve.server import MAX_LINE_BYTES

        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            try:
                f.write('{"op": "pcm", "channel": "x", "pcm": "')
                f.write("A" * (MAX_LINE_BYTES + 1024))
                f.write('"}\n')
                f.flush()
            except (BrokenPipeError, ConnectionResetError):
                return  # server already dropped us: the bound held
            try:
                line = f.readline()
            except (ConnectionResetError, OSError):
                return  # RST wiped the queue mid-close: the bound held
            if line:  # the polite path: one error reply, then closed
                assert json.loads(line) == {"error": "line too long"}
                try:
                    assert f.readline() == ""
                except (ConnectionResetError, OSError):
                    pass  # RST landed after the reply: still closed
            # empty line == connection closed without the reply being
            # readable — the server closing with our unread bytes in
            # flight RSTs, which can clear the receive queue first; the
            # bound was still enforced (nothing else was processed)


class TestWindowOrdering:
    def test_results_carry_window_index(self, server):
        """Pipelined score passes may complete out of order; every result
        carries the per-channel window counter so clients can reorder."""
        import socket

        pcm = synth_tone(700, 1.1, SR)
        with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
            f = s.makefile("rw")
            f.write(json.dumps({"op": "open", "channel": "w", "context": "m",
                                "duration_ms": 500, "continuous": True}) + "\n")
            f.flush()
            assert json.loads(f.readline())["opened"] is True
            f.write(json.dumps({"op": "pcm", "channel": "w",
                                "pcm": _pcm_b64(pcm)}) + "\n")
            f.flush()
            windows = [json.loads(f.readline())["window"] for _ in range(2)]
        assert sorted(windows) == [0, 1]


class TestWatchMode:
    def test_watch_syncs_added_and_removed_files(self, tmp_path):
        """A server started with watch_interval picks up files dropped
        into (and removed from) the media directory without a restart —
        the live-sync capability the reference lacks (it only syncs at
        module load, app_tiresias.c:66-123)."""
        import os
        import time

        from tiresias_tpu.config import ContextConfig
        from tiresias_tpu.utils.audio import write_wav

        media = tmp_path / "media"
        media.mkdir()
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("m", str(media)),),
                data_dir=str(tmp_path / "data"),
            ),
            restore=False,
        )
        eng.sync()
        assert eng.get_audios("m") == []

        started = threading.Event()
        holder = {}

        def runner():
            async def main():
                srv = RecognitionServer(
                    eng, port=0, samplerate=SR, watch_interval=0.2
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

        thread = threading.Thread(target=runner, daemon=True)
        thread.start()
        assert started.wait(10)
        try:
            wav = media / "late.wav"
            write_wav(str(wav), synth_tone(440, 1.0, SR), SR)

            def wait_for(pred, timeout=30.0):
                deadline = time.monotonic() + timeout
                while time.monotonic() < deadline:
                    if pred():
                        return True
                    time.sleep(0.1)
                return False

            assert wait_for(
                lambda: [a.name for a in eng.get_audios("m")] == ["late.wav"]
            )
            os.unlink(wav)
            assert wait_for(lambda: eng.get_audios("m") == [])
        finally:
            asyncio.run_coroutine_threadsafe(
                holder["server"].stop(), holder["loop"]
            ).result(10)
            eng.close()

    def test_invalid_watch_interval_rejected(self, engine):
        with pytest.raises(ValueError, match="watch_interval"):
            RecognitionServer(engine, port=0, watch_interval=0)


class TestGracefulShutdown:
    def test_sigterm_closes_engine_and_releases_lock(self, tmp_path):
        """`tiresias serve` on SIGTERM must stop, checkpoint, clear
        server.json, and release the data-dir lock (the reference's
        unload-time term() sequence, app_tiresias.c:125-149)."""
        import os
        import signal
        import subprocess
        import sys
        import time

        from tiresias_tpu.config import ContextConfig
        from tiresias_tpu.utils.audio import synth_tone, write_wav

        media = tmp_path / "media"
        media.mkdir()
        write_wav(str(media / "a.wav"), synth_tone(440, 1.0, SR), SR)
        data = tmp_path / "data"
        conf = tmp_path / "t.conf"
        conf.write_text(
            f"[global]\ndata_dir={data}\n\n[m]\ndirectory={media}\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen(
            [sys.executable, "-m", "tiresias_tpu.cli", "-c", str(conf),
             "serve", "--port", "0", "--max-channels", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        try:
            import selectors

            sel = selectors.DefaultSelector()
            sel.register(proc.stdout, selectors.EVENT_READ)
            deadline = time.monotonic() + 120
            line = ""
            while time.monotonic() < deadline:
                # deadline-aware read: a silent child must not block the
                # suite on readline() past the deadline
                if not sel.select(timeout=deadline - time.monotonic()):
                    break
                line = proc.stdout.readline()
                if not line or "tiresias serving on" in line:
                    break
            sel.close()
            assert "tiresias serving on" in line, "server never came up"
            assert (data / "server.json").exists()
            proc.send_signal(signal.SIGTERM)
            assert proc.wait(timeout=60) == 0
        finally:
            if proc.poll() is None:
                proc.kill()
        assert not (data / "server.json").exists()
        # lock released: a fresh exclusive engine must acquire instantly
        eng = Tiresias(
            TiresiasConfig(data_dir=str(data)), exclusive=True
        )
        assert [a.name for a in eng.get_audios("m")] == ["a.wav"]
        eng.close()


class _FakeTransport:
    def __init__(self):
        self.aborted = False

    def abort(self):
        self.aborted = True


class _FakeWriter:
    """StreamWriter stand-in for driving server internals deterministically."""

    def __init__(self, hang_drain=False):
        self.lines = []
        self.hang_drain = hang_drain
        self.transport = _FakeTransport()

    def write(self, data: bytes):
        self.lines.append(json.loads(data))

    async def drain(self):
        if self.hang_drain:
            await asyncio.Event().wait()  # a peer that never reads

    def is_closing(self):
        return False


class TestServeHardening:
    """Round-3 serve-layer review fixes: capacity cap, duplicate open,
    read-only admin, hangup keeps in-flight delivery, drain timeout."""

    def test_channel_capacity_enforced(self, engine):
        started = threading.Event()
        holder = {}

        def runner():
            async def main():
                srv = RecognitionServer(
                    engine, port=0, samplerate=SR, max_channels=2
                )
                await srv.start()
                holder["server"], holder["loop"] = (
                    srv, asyncio.get_running_loop()
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
            msgs = [
                {"op": "open", "channel": f"c{i}", "context": "m",
                 "duration_ms": 3000}
                for i in range(3)
            ]
            # ONE connection throughout: the hangup must target a channel
            # THIS connection opened (ids are connection-scoped), and the
            # freed slot must be observable while the connection still
            # holds its other channel
            msgs += [
                {"op": "hangup", "channel": "c0"},
                {"op": "open", "channel": "c3", "context": "m",
                 "duration_ms": 3000},
            ]
            replies = _talk(holder["server"].port, msgs, expect_lines=5)
            assert replies[0]["opened"] and replies[1]["opened"]
            assert replies[2].get("code") == "at_capacity"
            # hangup mid-recording delivers a HANGUP result...
            assert replies[3]["result"]["TIRSTATUS"] == "HANGUP"
            # ...and ACTUALLY freed a slot: the next open succeeds
            assert replies[4] == {"channel": "c3", "opened": True}
        finally:
            asyncio.run_coroutine_threadsafe(
                holder["server"].stop(), holder["loop"]
            ).result(10)

    def test_duplicate_open_rejected(self, server):
        replies = _talk(
            server.port,
            [{"op": "open", "channel": "dup", "context": "m",
              "duration_ms": 3000},
             {"op": "open", "channel": "dup", "context": "m",
              "duration_ms": 3000}],
            expect_lines=2,
        )
        assert replies[0]["opened"] is True
        assert "already open" in replies[1]["error"]

    def test_admin_readonly_server_rejects_mutations(self, tmp_path):
        """A server over a read-only engine (another process owns the data
        dir) must refuse admin mutations BEFORE touching its in-memory
        store — a half-applied delete would silently diverge it from what
        the owner serves."""
        cfg = TiresiasConfig(
            match=MatchConfig(coefs=2, tolerance=0.01, trunc_coef1=False),
            data_dir=str(tmp_path),
        )
        owner = Tiresias(cfg, restore=False)
        assert owner.lock.held
        ro = Tiresias(cfg, restore=False)  # lock taken -> degrades readonly
        assert not ro.lock.held
        ro.create_context("m")  # in-memory only
        ro.add_audio_pcm("m", "t0", synth_tone(440, 1.0, SR), SR)
        uuid = ro.get_audios("m")[0].uuid

        async def drive():
            srv = RecognitionServer(ro, port=0, samplerate=SR)
            reply = await srv._dispatch_admin(
                {"cmd": "remove_audio", "uuid": uuid}
            )
            assert reply.get("code") == "read_only", reply
            # reads still work on a read-only replica
            reply = await srv._dispatch_admin({"cmd": "show_contexts"})
            assert [c["name"] for c in reply["admin"]["contexts"]] == ["m"]

        asyncio.run(drive())
        assert [a.name for a in ro.get_audios("m")] == ["t0"]  # unmutated
        ro.close()
        owner.close()

    def test_hangup_keeps_writer_for_inflight_window(self, engine):
        """Hangup must not release the writer/opened bookkeeping: an
        earlier window of the channel may still be inside a batched pass,
        and its result must reach the still-connected client."""
        from tiresias_tpu.api.engine import SearchResult

        async def drive():
            srv = RecognitionServer(engine, port=0, samplerate=SR)
            fake = _FakeWriter()
            opened = set()

            def cid(channel):
                return f"7|{channel}"

            await srv._dispatch_op(
                "open", "c1",
                {"op": "open", "channel": "c1", "context": "m",
                 "duration_ms": 3000, "continuous": True, "hop_ms": 500},
                cid, opened, fake, True,
            )
            assert fake.lines[-1]["opened"] is True
            # partial buffer -> hangup flushes a HANGUP result (not None)
            srv.recognizer.push(cid("c1"), synth_tone(440, 1.0, SR))
            await srv._dispatch_op(
                "hangup", "c1", {"op": "hangup", "channel": "c1"},
                cid, opened, fake, True,
            )
            assert fake.lines[-1]["result"]["TIRSTATUS"] == "HANGUP"
            # FIXED bookkeeping: writer and opened survive the hangup so a
            # late in-flight window can still deliver
            assert cid("c1") in srv._writers and cid("c1") in opened
            late = SearchResult(
                status="FOUND", frame_count=93, match_count=90,
                uuid="u", name="tone1", context="m", hash="h", window=0,
            )
            await srv._send_result(cid("c1"), late)
            assert fake.lines[-1]["result"]["TIRFILENAME"] == "tone1"
            # a SECOND in-flight window also delivers — the first delivery
            # must not have popped the writer (review finding)
            import dataclasses

            await srv._send_result(
                cid("c1"), dataclasses.replace(late, window=1)
            )
            assert fake.lines[-1]["window"] == 1
            # the hangup's deferred release (scheduled behind the passes
            # in flight at hangup time — none here) frees the bookkeeping
            await asyncio.gather(*srv._cleanups)
            assert cid("c1") not in srv._writers and cid("c1") not in opened

        asyncio.run(drive())

    def test_unresponsive_client_cannot_wedge_scorer(self, engine, monkeypatch):
        """A peer that stops reading must not park the shared score pass on
        writer.drain() forever — the connection is aborted instead."""
        import tiresias_tpu.serve.server as server_mod
        from tiresias_tpu.api.engine import SearchResult

        monkeypatch.setattr(server_mod, "DRAIN_TIMEOUT_S", 0.05)

        async def drive():
            srv = RecognitionServer(engine, port=0, samplerate=SR)
            srv.recognizer.open("9|c1", context="m", duration_ms=3000,
                                continuous=True)
            fake = _FakeWriter(hang_drain=True)
            srv._writers["9|c1"] = fake
            result = SearchResult(
                status="NOTFOUND", frame_count=93, match_count=0, window=0
            )
            await asyncio.wait_for(srv._send_result("9|c1", result), 5)
            assert fake.transport.aborted
            srv.recognizer.hangup("9|c1", flush=False)

        asyncio.run(drive())
