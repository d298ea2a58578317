"""G.711 µ-law/A-law wire format: codec exactness, device-decode parity,
and the serve-layer plumbing.

The reference never sees G.711 — Asterisk decodes the trunk before
handing frames to the dialplan app
(/root/reference/src/application_handler.c:264-302). The standalone
framework accepts trunk bytes directly (one byte per 8 kHz sample, half
the int16 wire/H2D bytes) and expands them ON DEVICE
(ops/mfcc_jax.to_float_pcm), so every claim here is about bitwise parity
with the host-decoded linear path.
"""

import asyncio
import base64
import json
import threading

import numpy as np
import pytest

from tiresias_tpu.api import Tiresias
from tiresias_tpu.config import ContextConfig, TiresiasConfig
from tiresias_tpu.ops.mfcc_jax import (
    fingerprint_signals_async,
    pad_frames_bucket,
)
from tiresias_tpu.serve import StreamingRecognizer
from tiresias_tpu.utils import g711
from tiresias_tpu.utils.audio import synth_tone

SR = 8000

try:
    import warnings

    with warnings.catch_warnings():
        # deprecated in 3.12, removed in 3.13 — exactly why it's only an
        # optional oracle here (the golden spot values cover 3.13+)
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop  # stdlib oracle

    HAVE_AUDIOOP = True
except ImportError:  # pragma: no cover
    HAVE_AUDIOOP = False


def _tone_i16(freq: float, seconds: float = 3.0) -> np.ndarray:
    from tiresias_tpu.utils.audio import float_to_i16

    return float_to_i16(synth_tone(freq, seconds, SR))


class TestCodec:
    """Table/encoder exactness — the numeric foundation."""

    @pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
    def test_decode_tables_match_audioop(self):
        codes = np.arange(256, dtype=np.uint8).tobytes()
        ref_u = np.frombuffer(audioop.ulaw2lin(codes, 2), np.int16)
        ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), np.int16)
        assert np.array_equal(g711.ULAW_TO_I16, ref_u)
        assert np.array_equal(g711.ALAW_TO_I16, ref_a)

    @pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
    def test_encoders_match_audioop_exhaustively(self):
        pcm = np.arange(-32768, 32768, dtype=np.int16)
        ref_u = np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), np.uint8)
        ref_a = np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2), np.uint8)
        assert np.array_equal(g711.encode_ulaw(pcm), ref_u)
        assert np.array_equal(g711.encode_alaw(pcm), ref_a)

    def test_golden_spot_values(self):
        # CCITT G.711 expansion landmarks (independent of audioop, so the
        # test still bites on Pythons without it): full-scale and silence
        assert g711.ULAW_TO_I16[0x00] == -32124  # max negative
        assert g711.ULAW_TO_I16[0x80] == 32124  # max positive
        assert g711.ULAW_TO_I16[0xFF] == 0  # silence code
        assert g711.ALAW_TO_I16[0x2A] == -32256  # max negative (0x2A^0x55=0x7F|sign0)
        assert g711.ALAW_TO_I16[0xAA] == 32256  # max positive
        assert g711.ALAW_TO_I16[0xD5] == 8  # quietest positive
        assert g711.ALAW_TO_I16[0x55] == -8  # quietest negative

    def test_round_trip_all_codes(self):
        codes = np.arange(256, dtype=np.uint8)
        rt_a = g711.encode_alaw(g711.ALAW_TO_I16)
        assert np.array_equal(rt_a, codes)
        rt_u = g711.encode_ulaw(g711.ULAW_TO_I16)
        # µ-law negative zero (0x7F) canonicalizes to positive zero
        # (0xFF) — audioop does the identical thing
        mismatch = np.nonzero(rt_u != codes)[0]
        assert list(mismatch) == [0x7F]
        assert rt_u[0x7F] == 0xFF

    def test_silence_bytes_decode_nearest_zero(self):
        for law in g711.G711_LAWS:
            t = g711.decode_table(law).astype(np.int32)
            sil = int(t[g711.SILENCE_BYTE[law]])
            assert abs(sil) == np.abs(t).min()

    def test_decode_validation(self):
        with pytest.raises(ValueError, match="unknown G.711 law"):
            g711.decode_table("g729")
        with pytest.raises(ValueError, match="uint8"):
            g711.decode(np.zeros(4, np.int16), "ulaw")
        out = g711.decode(bytes([0xFF, 0x00]), "ulaw")
        assert out.dtype == np.int16 and list(out) == [0, -32124]


class TestDeviceDecode:
    """uint8 + law through the fingerprint stack == host decode, bitwise."""

    @pytest.mark.parametrize("law", g711.G711_LAWS)
    def test_fingerprint_bitwise_parity(self, law):
        tone = _tone_i16(440, 1.5)
        codes = g711.encode(tone, law)
        fd, nd = fingerprint_signals_async([codes], SR, law=law)
        fi, ni = fingerprint_signals_async([g711.decode(codes, law)], SR)
        assert np.array_equal(nd, ni)
        assert np.array_equal(np.asarray(fd), np.asarray(fi))

    def test_ragged_batch_parity(self):
        # A-law (the law with no exact zero): the decoded-padding mask
        # must zero tail samples exactly like the linear path's padding
        tone = _tone_i16(350, 2.0)
        c1, c2 = g711.encode_alaw(tone), g711.encode_alaw(tone[:9001])
        fd, _ = fingerprint_signals_async([c1, c2], SR, law="alaw")
        fi, _ = fingerprint_signals_async(
            [g711.decode(c1, "alaw"), g711.decode(c2, "alaw")], SR
        )
        assert np.array_equal(np.asarray(fd), np.asarray(fi))

    def test_pad_bucket_uses_silence_code(self):
        codes = g711.encode_ulaw(_tone_i16(300, 0.5))
        out, _ = pad_frames_bucket([codes], 256, law="ulaw")
        assert out.dtype == np.uint8
        assert (out[0, len(codes):] == g711.SILENCE_BYTE["ulaw"]).all()

    def test_pad_bucket_rejects_mismatches(self):
        with pytest.raises(ValueError, match="no wire_law"):
            pad_frames_bucket([np.zeros(256, np.uint8)], 256)
        with pytest.raises(ValueError, match="requires uint8"):
            pad_frames_bucket([np.zeros(256, np.int16)], 256, law="ulaw")


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    """Store COMPANDED-decoded tones (per law) — production telephony DBs
    are built from trunk recordings, and an exact-bits self-match at
    strict tolerance is what discriminates pure tones (their MFCC coefs
    differ by less than G.711 companding noise otherwise)."""
    eng = Tiresias(
        TiresiasConfig(
            contexts=(ContextConfig("s", "/nonexistent"),),
            data_dir=str(tmp_path_factory.mktemp("g711")),
        ),
        restore=False,
    )
    for i in range(4):
        tone = _tone_i16(300 + 100 * i)
        for law in g711.G711_LAWS:
            rt = g711.decode(g711.encode(tone, law), law)
            eng.add_audio_pcm(
                "s", f"tone{i}_{law}",
                rt.astype(np.float32) / 32768.0, SR,
            )
    yield eng
    eng.close()


def _wire_query(freq: float, law: str, seconds: float = 3.0) -> np.ndarray:
    """Trunk bytes whose decode is bit-identical to the stored twin."""
    return g711.encode(_tone_i16(freq, seconds), law)


class TestEngine:
    """wire_law through every search dispatch path == host decode."""

    @pytest.mark.parametrize("law", g711.G711_LAWS)
    @pytest.mark.parametrize(
        "kw, exact_name",
        [
            (dict(tolerance=1.0), False),  # fused lattice path (truncated
            # coef-1 collapses pure tones — tiebreak picks the winner)
            (dict(tolerance=0.01, coefs=2, trunc_coef1=False), True),
            (dict(tolerance=0.01, coefs=2, trunc_coef1=False,
                  aligned=True), True),  # accuracy mode
        ],
    )
    def test_search_parity_across_paths(self, engine, law, kw, exact_name):
        codes = _wire_query(400, law)  # tone1_<law>'s exact bits
        lin = g711.decode(codes, law)
        r_w = engine.search_pcm("s", codes, SR, wire_law=law, **kw)
        r_l = engine.search_pcm("s", lin, SR, **kw)
        assert (
            r_w.status, r_w.name, r_w.match_count, r_w.frame_count
        ) == (r_l.status, r_l.name, r_l.match_count, r_l.frame_count)
        assert r_w.status == "FOUND"
        if exact_name:  # strict tolerance: the stored twin self-matches
            assert r_w.name == f"tone1_{law}"

    def test_topk_wire_law(self, engine):
        codes = _wire_query(400, "ulaw")
        kw = dict(k=3, tolerance=0.01, coefs=2, trunc_coef1=False)
        tk = engine.search_pcm_topk("s", codes, SR, wire_law="ulaw", **kw)
        tl = engine.search_pcm_topk(
            "s", g711.decode(codes, "ulaw"), SR, **kw
        )
        assert [(t.name, t.match_count) for t in tk] == [
            (t.name, t.match_count) for t in tl
        ]
        assert tk and tk[0].name == "tone1_ulaw"

    def test_uint8_without_law_rejected(self, engine):
        with pytest.raises(ValueError, match="no wire_law"):
            engine.search_pcm("s", np.zeros(8000, np.uint8), SR)

    def test_warmup_laws(self, engine):
        engine.warmup(batch_sizes=(1, 2), laws=("ulaw",))

    def test_resample_decodes_on_host(self, tmp_path):
        # configured analysis rate != wire rate: companded bytes can't be
        # filtered, so the engine expands them before the polyphase
        from tiresias_tpu.config import DspConfig

        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("s", "/nonexistent"),),
                dsp=DspConfig(samplerate=8000),
                data_dir=str(tmp_path),
            ),
            restore=False,
        )
        try:
            eng.add_audio_pcm(
                "s", "t", _tone_i16(400).astype(np.float32) / 32768.0, SR
            )
            codes = g711.encode_ulaw(_tone_i16(400, 1.0))
            # wire claims 16 kHz → resample to 8 kHz forces the host path
            r = eng.search_pcm(
                "s", np.concatenate([codes, codes]), 16000,
                wire_law="ulaw", tolerance=1.0,
            )
            assert r.status == "FOUND"
        finally:
            eng.close()


STRICT = dict(tolerance=0.01, coefs=2, trunc_coef1=False)


class TestStreaming:
    def test_mixed_law_tick(self, engine):
        # one scorer tick with ulaw + alaw + linear channels: groups split
        # by law, each window scored against its exact stored twin
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("u", context="s", duration_ms=3000, law="ulaw", **STRICT)
        rec.open("a", context="s", duration_ms=3000, law="alaw", **STRICT)
        rec.open("l", context="s", duration_ms=3000, **STRICT)
        rec.push("u", _wire_query(400, "ulaw"))
        rec.push("a", _wire_query(400, "alaw"))
        rec.push("l", g711.decode(_wire_query(400, "ulaw"), "ulaw"))
        res = rec.process_ready()
        assert res["u"].name == "tone1_ulaw"
        assert res["a"].name == "tone1_alaw"
        assert res["l"].name == "tone1_ulaw"
        assert res["u"].match_count == res["l"].match_count

    def test_odd_batch_pads_with_silence_code(self, engine):
        # 3 channels pad to batch 4 with the law's silence byte — a zero
        # byte would be a full-scale DC query (wasted, possibly matching)
        rec = StreamingRecognizer(engine, samplerate=SR)
        for i in range(3):
            rec.open(f"c{i}", context="s", duration_ms=3000,
                     law="ulaw", **STRICT)
            rec.push(f"c{i}", _wire_query(500, "ulaw"))
        res = rec.process_ready()
        assert all(res[f"c{i}"].name == "tone2_ulaw" for i in range(3))

    def test_dtype_rejections(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("u", context="s", law="ulaw")
        with pytest.raises(ValueError, match="uint8 G.711"):
            rec.push("u", np.zeros(100, np.int16))
        rec.open("l", context="s")
        with pytest.raises(ValueError, match="linear channel"):
            rec.push("l", np.zeros(100, np.uint8))
        with pytest.raises(ValueError, match="unknown wire law"):
            rec.open("x", context="s", law="gsm")

    def test_hangup_flush_on_law_channel(self, engine):
        rec = StreamingRecognizer(engine, samplerate=SR)
        rec.open("u", context="s", duration_ms=1000, law="ulaw", **STRICT)
        rec.push("u", _wire_query(600, "ulaw", 1.2))  # tone3's bits
        r = rec.hangup("u")
        assert r.status == "FOUND" and r.name == "tone3_ulaw"


@pytest.fixture()
def server(engine):
    from tiresias_tpu.serve.server import RecognitionServer

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

    threading.Thread(target=runner, daemon=True).start()
    assert started.wait(10)
    yield holder["server"]
    # wait for the stop: the module-scoped engine must not be closed
    # while the server thread still holds it mid-search
    asyncio.run_coroutine_threadsafe(
        holder["server"].stop(), holder["loop"]
    ).result(10)


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
    def test_ulaw_channel_round_trip(self, server):
        codes = _wire_query(600, "ulaw", 1.2)  # tone3_ulaw's bits
        msgs = [
            {"op": "open", "channel": "g", "context": "s",
             "duration_ms": 1000, "format": "ulaw", "coefs": 2,
             "tolerance": 0.01, "trunc_coef1": False},
            {"op": "pcm", "channel": "g",
             "pcm": base64.b64encode(codes.tobytes()).decode()},
        ]
        replies = _talk(server.port, msgs, expect_lines=2)
        assert replies[0] == {"channel": "g", "opened": True}
        assert replies[1]["result"]["TIRSTATUS"] == "FOUND"
        assert replies[1]["result"]["TIRFILENAME"] == "tone3_ulaw"

    def test_bad_format_rejected(self, server):
        replies = _talk(
            server.port,
            [{"op": "open", "channel": "b", "context": "s",
              "format": "gsm"}],
            expect_lines=1,
        )
        assert "unknown format" in replies[0]["error"]

    def test_admin_search_g711_payload(self, server):
        codes = _wire_query(500, "alaw", 1.2)  # tone2_alaw's bits
        replies = _talk(
            server.port,
            [{"op": "admin", "cmd": "search", "context": "s",
              "tolerance": 0.01, "coefs": 2, "trunc_coef1": False,
              "queries": [{"pcm": base64.b64encode(codes.tobytes()).decode(),
                           "dtype": "alaw", "samplerate": SR}]}],
            expect_lines=1,
        )
        results = replies[0]["admin"]["results"]
        assert results[0]["TIRSTATUS"] == "FOUND"
        assert results[0]["TIRFILENAME"] == "tone2_alaw"


class TestIngest:
    def test_add_audio_pcm_wire_law(self, tmp_path):
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("s", "/nonexistent"),),
                data_dir=str(tmp_path),
            ),
            restore=False,
        )
        try:
            wire = _wire_query(420, "ulaw")
            e = eng.add_audio_pcm("s", "trunkrec", wire, SR,
                                  wire_law="ulaw")
            assert e is not None
            # the same trunk bytes self-match at strict tolerance: ingest
            # and search expand through the same exact table
            r = eng.search_pcm("s", wire, SR, wire_law="ulaw",
                               coefs=2, tolerance=0.01, trunc_coef1=False)
            assert r.found and r.uuid == e.uuid
            assert r.match_count == r.frame_count
        finally:
            eng.close()


class TestProtocolDtype:
    def test_admin_search_unknown_dtype_rejected(self, server):
        replies = _talk(
            server.port,
            [{"op": "admin", "cmd": "search", "context": "s",
              "queries": [{"pcm": base64.b64encode(b"\x00\x00").decode(),
                           "dtype": "f64"}]}],
            expect_lines=1,
        )
        assert "unknown dtype" in replies[0]["error"]


class TestG711WavIngest:
    """G.711 WAVs ingest as RAW wire bytes (round-5 compressed ingest
    wire): read_wav_g711 parses format tags 7/6 without expanding;
    engine/sync ships the codes to the device, where the table expansion
    is bit-identical to host decoding (PARITY D18)."""

    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_wav_round_trip(self, tmp_path, law):
        from tiresias_tpu.utils.audio import read_wav_g711, write_wav_g711

        codes = g711.encode(_tone_i16(440, 1.0), law)
        p = str(tmp_path / "t.wav")
        write_wav_g711(p, codes, SR, law)
        got = read_wav_g711(p)
        assert got is not None
        got_codes, sr, got_law = got
        assert sr == SR and got_law == law
        np.testing.assert_array_equal(got_codes, codes)

    def test_non_g711_wav_returns_none(self, tmp_path):
        from tiresias_tpu.utils.audio import read_wav_g711, write_wav

        p = str(tmp_path / "pcm.wav")
        write_wav(p, synth_tone(440, 0.5, SR), SR)
        assert read_wav_g711(p) is None
        assert read_wav_g711(str(tmp_path / "missing.wav")) is None

    @pytest.mark.parametrize("law", ["ulaw", "alaw"])
    def test_sync_ingests_wire_bytes_bit_identical(self, tmp_path, law):
        """A synced G.711 WAV must store the SAME fingerprint as host-
        decoding the codes and ingesting linear PCM (D18 exactness), and
        wire-byte queries of the same codes must self-match fully."""
        from tiresias_tpu.utils.audio import write_wav_g711

        codes = g711.encode(_tone_i16(330, 1.0), law)
        media = tmp_path / "m"
        media.mkdir()
        write_wav_g711(str(media / "a.wav"), codes, SR, law)
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("c", str(media)),),
                data_dir=str(tmp_path / "d"),
            ),
            restore=False,
        )
        assert eng.sync().created == 1
        entry = eng.get_audios("c")[0]
        fp_wire = eng.store.get_fingerprint(entry.uuid)
        # oracle: host-decode the same codes, ingest as linear floats
        eng.create_context("o")
        host = g711.decode(codes, law)
        e2 = eng.add_audio_pcm("o", "host", host, SR)
        fp_host = eng.store.get_fingerprint(e2.uuid)
        # allclose, not array_equal: the uint8-gather and float programs
        # are DIFFERENT XLA compilations (1-ulp fusion wobble on CPU);
        # same-shape bitwise parity is TestDeviceDecode's claim
        np.testing.assert_allclose(fp_wire, fp_host, atol=2e-5)
        # the wire bytes as a search query hit their own file exactly
        r = eng.search_pcm(
            "c", codes, SR, coefs=2, tolerance=0.01, trunc_coef1=False,
            wire_law=law,
        )
        assert r.status == "FOUND" and r.name == "a.wav"
        assert r.match_count == r.frame_count
        eng.close()

    def test_sync_over_mesh_matches_unsharded_g711(self, tmp_path):
        """The mesh ingest path must apply the same expansion + valid-
        sample masking per shard (sharded_fingerprint law/n_valid)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tiresias_tpu.parallel import make_mesh
        from tiresias_tpu.utils.audio import write_wav_g711

        media = tmp_path / "m"
        media.mkdir()
        for i in range(6):
            codes = g711.encode(_tone_i16(200 + 40 * i, 0.7), "ulaw")
            write_wav_g711(str(media / f"m{i}.wav"), codes, SR, "ulaw")
        mk = lambda sub, mesh: Tiresias(  # noqa: E731
            TiresiasConfig(
                contexts=(ContextConfig("c", str(media)),),
                data_dir=str(tmp_path / sub),
            ),
            restore=False, mesh=mesh,
        )
        eng_m = mk("dm", make_mesh(4, 2))
        eng_s = mk("ds", None)
        assert eng_m.sync().created == 6
        assert eng_s.sync().created == 6
        fm = {e.name: eng_m.store.get_fingerprint(e.uuid)
              for e in eng_m.get_audios("c")}
        fs = {e.name: eng_s.store.get_fingerprint(e.uuid)
              for e in eng_s.get_audios("c")}
        assert fm.keys() == fs.keys()
        for name in fm:
            np.testing.assert_allclose(fm[name], fs[name], atol=1e-5)
        eng_m.close()
        eng_s.close()
