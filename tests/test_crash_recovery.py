"""Crash-recovery drill: SIGKILL a live server, assert clean takeover.

The reference loses its whole in-memory DB on a crash (the SQLite backup
only runs in unload-time term(), /root/reference/src/fp_handler.c:97-103).
This build claims better: crash-safe two-generation checkpoints
(test_checkpoint_v3), kernel-released flocks (utils/locking.py), and
liveness-validated server.json (read_server_info). Those are unit-tested;
this drill proves the pieces compose at the process level — a KILLed
``tiresias serve`` must leave a directory a fresh engine can own and serve
from immediately, with the last committed data intact.
"""

import json
import os
import queue
import signal
import socket
import subprocess
import sys
import threading
import time

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import TiresiasConfig
from tiresias_tpu.utils.audio import synth_tone, write_wav
from tiresias_tpu.utils.locking import read_server_info

SR = 8000


def _spawn_serve(conf_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tiresias_tpu.cli", "-c", str(conf_path),
         "serve", "--port", "0", "--max-channels", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True,
    )
    # a reader THREAD, not select()-on-the-fd: readline() buffers, so a
    # banner that arrived in the same pipe read as an earlier log line
    # would sit in the TextIO buffer where select never sees it
    lines: queue.Queue = queue.Queue()

    def pump():
        for ln in proc.stdout:
            lines.put(ln)
        lines.put(None)

    threading.Thread(target=pump, daemon=True).start()
    deadline = time.monotonic() + 120
    while True:
        try:
            line = lines.get(timeout=max(0.1, deadline - time.monotonic()))
        except queue.Empty:
            proc.kill()
            raise AssertionError("server never came up (timeout)")
        if line is None:
            proc.wait(timeout=10)
            raise AssertionError("server exited before its banner")
        if "tiresias serving on" in line:
            return proc
        if time.monotonic() > deadline:
            proc.kill()
            raise AssertionError("server never came up (deadline)")


def test_sigkill_leaves_recoverable_data_dir(tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    write_wav(str(media / "a.wav"), synth_tone(440, 1.0, SR), SR)
    write_wav(str(media / "b.wav"), synth_tone(880, 1.0, SR), SR)
    data = tmp_path / "data"
    conf = tmp_path / "t.conf"
    conf.write_text(
        f"[global]\ndata_dir={data}\n\n[m]\ndirectory={media}\n"
    )

    proc = _spawn_serve(conf)
    try:
        # the server owns the dir and advertises itself
        info = read_server_info(str(data))
        assert info and info["pid"] == proc.pid
        # confirm it actually serves before the crash
        with socket.create_connection(
            ("127.0.0.1", info["port"]), timeout=10
        ) as s:
            s.sendall((json.dumps({"op": "stats"}) + "\n").encode())
            s.settimeout(10)
            reply = json.loads(s.makefile().readline())
        assert "stats" in reply, reply
    finally:
        proc.send_signal(signal.SIGKILL)  # simulated crash: no cleanup runs
        proc.wait(timeout=30)

    # stale server.json is on disk but must NOT be trusted: the owner's
    # flock died with the process, so the liveness probe rejects it
    assert (data / "server.json").exists()
    assert read_server_info(str(data)) is None

    # a fresh exclusive engine takes ownership immediately (no lease
    # timeout, no manual lock cleanup) and the committed data is intact
    eng = Tiresias(TiresiasConfig(data_dir=str(data)), exclusive=True)
    try:
        names = sorted(a.name for a in eng.get_audios("m"))
        assert names == ["a.wav", "b.wav"]
        r = eng.search_pcm("m", synth_tone(440, 1.0, SR), SR, tolerance=1.0)
        assert r.found and r.name == "a.wav"
    finally:
        eng.close()
