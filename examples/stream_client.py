#!/usr/bin/env python3
"""Minimal recognition client for the `tiresias serve` TCP service.

Streams a WAV file to the server in real-time-paced 20 ms frames (like a
telephony channel) and prints the TIR* result — the socket-level analogue
of the reference's dialplan call
(/root/reference/doc/dialplan_application.rst).

Usage:
    python examples/stream_client.py query.wav [context] [host] [port] [format]

``format`` may be ``l16`` (default) or ``ulaw``/``alaw`` — the G.711 mode
encodes the WAV to trunk bytes locally and streams those (half the wire
payload; the server decodes on device — docs/streaming.md).
"""

import base64
import json
import socket
import sys
import time
import wave

SAMPLERATE = 8000
FRAME_MS = 20


def main() -> int:
    path = sys.argv[1]
    context = sys.argv[2] if len(sys.argv) > 2 else "media"
    host = sys.argv[3] if len(sys.argv) > 3 else "127.0.0.1"
    port = int(sys.argv[4]) if len(sys.argv) > 4 else 8517
    fmt = sys.argv[5] if len(sys.argv) > 5 else "l16"

    with wave.open(path, "rb") as wf:
        assert wf.getsampwidth() == 2 and wf.getnchannels() == 1, \
            "expected 16-bit mono WAV"
        assert wf.getframerate() == SAMPLERATE, f"expected {SAMPLERATE} Hz"
        pcm = wf.readframes(wf.getnframes())

    bytes_per_sample = 2
    if fmt != "l16":
        import os

        import numpy as np

        try:
            from tiresias_tpu.utils.g711 import encode
        except ModuleNotFoundError:
            # running the example straight from a checkout: python puts
            # examples/ (not the repo root) on sys.path
            sys.path.insert(
                0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            from tiresias_tpu.utils.g711 import encode

        pcm = encode(
            np.frombuffer(pcm, dtype="<i2"), fmt
        ).tobytes()  # one G.711 byte per sample
        bytes_per_sample = 1
    frame_bytes = SAMPLERATE * bytes_per_sample * FRAME_MS // 1000
    with socket.create_connection((host, port), timeout=30.0) as sock:
        # the timeout bounds the result wait: a lost connection or server
        # fault raises instead of blocking the read loop forever
        f = sock.makefile("rw", encoding="utf-8", newline="\n")
        f.write(json.dumps({
            "op": "open", "channel": "demo", "context": context,
            "duration_ms": 3000, "format": fmt,
        }) + "\n")
        f.flush()
        opened = json.loads(f.readline())
        if not opened.get("opened"):
            # e.g. at_capacity — streaming into a never-opened channel
            # would be silently dropped and the result wait would time out
            print(f"open rejected: {opened.get('error', opened)}",
                  file=sys.stderr)
            return 1
        for off in range(0, len(pcm), frame_bytes):
            f.write(json.dumps({
                "op": "pcm", "channel": "demo",
                "pcm": base64.b64encode(pcm[off:off + frame_bytes]).decode(),
            }) + "\n")
            f.flush()
            time.sleep(FRAME_MS / 1000)  # real-time pacing
        f.write(json.dumps({"op": "hangup", "channel": "demo"}) + "\n")
        f.flush()
        for line in f:
            msg = json.loads(line)
            if "error" in msg:
                print(f"server error: {msg['error']}", file=sys.stderr)
                return 1
            if "result" in msg:
                for key, value in msg["result"].items():
                    print(f"{key}={value}")
                return 0 if msg["result"].get("TIRSTATUS") == "FOUND" else 2
    return 1


if __name__ == "__main__":
    sys.exit(main())
