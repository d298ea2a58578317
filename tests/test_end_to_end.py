"""End-to-end slice: directory ingest → search → TIR* result contract.

The BASELINE config #1 scenario: a 10-clip context of synthetic WAVs ingested
from a directory, queried through the full pipeline, with the reference's
output contract (TIRSTATUS/TIRFRAMECOUNT/TIRMATCHCOUNT/...,
/root/reference/src/application_handler.c:166-234) and the directory-sync
behaviors of init_audio (/root/reference/src/app_tiresias.c:324-358).

Two accuracy regimes (PARITY.md §5, D8):
  * parity mode (trunc_coef1=True, the reference's (int) cast of max1): exact
    copies reach full votes only at tolerance ≥ 1, where discrimination is
    weak — asserted accordingly (winner has full votes; true clip is tied at
    the top).
  * extension mode (trunc_coef1=False, coefs=2, tolerance 0.01): exact copies
    must win strictly — real recognition accuracy.
"""

import os

import numpy as np
import pytest

from tiresias_tpu.api import STATUS_FOUND, STATUS_NOTFOUND, Tiresias
from tiresias_tpu.config import (
    ContextConfig,
    DspConfig,
    MatchConfig,
    TiresiasConfig,
)
from tiresias_tpu.utils.audio import (
    read_wav,
    synth_chirp,
    synth_noise,
    synth_tone,
    write_wav,
)

SR = 8000
EXT = dict(coefs=2, tolerance=0.01, trunc_coef1=False)  # PARITY.md D8 mode


def _make_corpus(directory: str, n: int = 10) -> list[str]:
    """n distinct 1-s clips: tones, chirps, noises (all 8 kHz mono)."""
    os.makedirs(directory, exist_ok=True)
    names = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            pcm = synth_tone(250 + 130 * i, 1.0, SR)
        elif kind == 1:
            pcm = synth_chirp(200 + 90 * i, 900 + 150 * i, 1.0, SR)
        else:
            pcm = synth_noise(1.0, SR, seed=i)
        name = f"clip{i:02d}.wav"
        write_wav(os.path.join(directory, name), pcm, SR)
        names.append(name)
    return names


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    names = _make_corpus(str(d))
    return str(d), names


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    directory, _ = corpus
    data = tmp_path_factory.mktemp("data")
    cfg = TiresiasConfig(
        dsp=DspConfig(),
        match=MatchConfig(),
        contexts=(ContextConfig(name="media", directory=directory),),
        data_dir=str(data),
    )
    eng = Tiresias(cfg)
    report = eng.sync()
    assert report.created == 10 and report.failed == 0
    return eng


class TestIngest:
    def test_catalog_populated(self, engine, corpus):
        _, names = corpus
        audios = engine.get_audios("media")
        assert sorted(a.name for a in audios) == sorted(names)
        for a in audios:
            assert a.n_frames > 0 and len(a.uuid) == 36 and len(a.hash) == 32

    def test_resync_dedupes(self, engine):
        report = engine.sync()
        assert report.created == 0 and report.deduped == 10

    def test_checkpoint_written(self, engine):
        assert os.path.exists(os.path.join(engine.checkpoint_dir, "catalog.json"))


class TestSearchExtensionMode:
    """trunc_coef1=False, coefs=2, tol=0.01 — strict recognition (D8)."""

    def test_self_match_strict_all_clips(self, engine, corpus):
        directory, names = corpus
        for name in names:
            res = engine.search_file("media", os.path.join(directory, name), **EXT)
            assert res.status == STATUS_FOUND, name
            assert res.name == name, f"query {name} matched {res.name}"
            assert res.match_count == res.frame_count  # exact copy: full votes
            assert res.context == "media"

    def test_batched_self_match(self, engine, corpus):
        directory, names = corpus
        pcms = [read_wav(os.path.join(directory, n))[0] for n in names]
        results = engine.search_pcm_batch("media", pcms, SR, **EXT)
        assert [r.name for r in results] == names

    def test_truncated_query_still_matches(self, engine, corpus):
        directory, names = corpus
        pcm, sr = read_wav(os.path.join(directory, names[0]))
        res = engine.search_pcm("media", pcm[: SR // 2], sr, **EXT)
        assert res.found and res.name == names[0]


class TestSearchParityMode:
    """Default reference semantics: (int) cast on max1 (PARITY.md §3.1, §5)."""

    def test_full_votes_at_tolerance_one(self, engine, corpus):
        # |trunc(x) − x| < 1 always, so an exact copy reaches full votes at
        # tol=1.0; discrimination is weak there — the true clip is only
        # guaranteed to be *tied* at the top (PARITY.md §5).
        directory, names = corpus
        res = engine.search_file(
            "media", os.path.join(directory, names[3]), tolerance=1.0
        )
        assert res.found and res.match_count == res.frame_count

    def test_default_tolerance_rarely_self_matches(self, engine, corpus):
        # At the default 0.001 tolerance the (int) cast makes votes sparse:
        # winner votes must be well below full frame count.
        directory, names = corpus
        res = engine.search_file("media", os.path.join(directory, names[0]))
        if res.found:
            assert res.match_count < res.frame_count

    def test_nomatch_returns_notfound(self, engine):
        pcm = synth_tone(3456.7, 0.5, SR)
        res = engine.search_pcm("media", pcm, SR, tolerance=1e-9, **{
            **{k: v for k, v in EXT.items() if k != "tolerance"}
        })
        assert res.status in (STATUS_FOUND, STATUS_NOTFOUND)
        vars_ = res.to_channel_vars()
        assert "TIRSTATUS" in vars_ and "TIRFRAMECOUNT" in vars_

    def test_empty_store_notfound(self, tmp_path):
        eng = Tiresias(TiresiasConfig(data_dir=str(tmp_path)), restore=False)
        res = eng.search_pcm(None, synth_tone(440, 0.5, SR), SR)
        assert res.status == STATUS_NOTFOUND and res.frame_count > 0

    def test_channel_vars_contract(self, engine, corpus):
        directory, names = corpus
        res = engine.search_file("media", os.path.join(directory, names[1]), **EXT)
        vars_ = res.to_channel_vars()
        # the seven TIR* variables (/root/reference/doc/dialplan_application.rst)
        assert set(vars_) == {
            "TIRSTATUS",
            "TIRFRAMECOUNT",
            "TIRMATCHCOUNT",
            "TIRFILEUUID",
            "TIRFILENAME",
            "TIRCONTEXT",
            "TIRFILEHASH",
        }
        assert vars_["TIRSTATUS"] == "FOUND"
        assert int(vars_["TIRFRAMECOUNT"]) == res.frame_count
        assert 0.0 < res.confidence <= 1.0

    def test_invalid_coefs_rejected(self, engine):
        # fp_handler.c:247-250
        with pytest.raises(ValueError):
            engine.search_pcm("media", synth_tone(440, 0.2, SR), SR, coefs=3)

    def test_negative_tolerance_uses_default(self, engine, corpus):
        # fp_handler.c:252-256: negative → default 0.001; search must run
        directory, names = corpus
        res = engine.search_file(
            "media", os.path.join(directory, names[0]), tolerance=-5.0
        )
        assert res.frame_count > 0


class TestDialplanArgs:
    def test_full_argstring(self):
        from tiresias_tpu.api.engine import parse_dialplan_args

        args = parse_dialplan_args("media,5000,0.5,100,3000")
        assert args == {
            "context": "media",
            "duration_ms": 5000,
            "tolerance": 0.5,
            "freq_ignore_low": 100,
            "freq_ignore_high": 3000,
        }

    def test_optional_fields_omitted(self):
        from tiresias_tpu.api.engine import parse_dialplan_args

        assert parse_dialplan_args("ctx") == {"context": "ctx"}
        assert parse_dialplan_args("ctx,3000,,") == {
            "context": "ctx",
            "duration_ms": 3000,
        }
        with pytest.raises(ValueError):
            parse_dialplan_args(",3000")


class TestTopK:
    def test_ranked_candidates(self, engine, corpus):
        directory, names = corpus
        from tiresias_tpu.utils.audio import read_wav

        pcm, sr = read_wav(os.path.join(directory, names[2]))
        # high tolerance in parity mode → several candidates share votes
        ranked = engine.search_pcm_topk("media", pcm, sr, k=3, tolerance=1.0)
        assert 1 <= len(ranked) <= 3
        counts = [r.match_count for r in ranked]
        assert counts == sorted(counts, reverse=True)
        assert all(r.found for r in ranked)
        # top-1 agrees with the regular search
        single = engine.search_pcm("media", pcm, sr, tolerance=1.0)
        assert ranked[0].uuid == single.uuid


class TestDirectorySync:
    def test_file_removal_deletes_entry(self, tmp_path):
        directory = tmp_path / "ctx"
        _make_corpus(str(directory), 3)
        cfg = TiresiasConfig(
            contexts=(ContextConfig(name="c", directory=str(directory)),),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(cfg, restore=False)
        assert eng.sync().created == 3
        os.remove(directory / "clip00.wav")
        report = eng.sync()
        assert report.deleted == 1
        assert sorted(a.name for a in eng.get_audios("c")) == [
            "clip01.wav",
            "clip02.wav",
        ]

    def test_mixed_samplerates_one_directory(self, tmp_path):
        # the reference analyses at each file's native rate (fp_handler.c:37);
        # ingest groups by samplerate and fingerprints each group separately
        directory = tmp_path / "mixed"
        directory.mkdir()
        write_wav(str(directory / "a8k.wav"), synth_tone(440, 0.5, 8000), 8000)
        write_wav(str(directory / "b16k.wav"), synth_tone(440, 0.5, 16000), 16000)
        cfg = TiresiasConfig(
            contexts=(ContextConfig(name="mx", directory=str(directory)),),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(cfg, restore=False)
        report = eng.sync()
        assert report.created == 2 and report.failed == 0
        frames = {a.name: a.n_frames for a in eng.get_audios("mx")}
        # same duration, double the rate → double the frames
        assert frames["b16k.wav"] == 2 * frames["a8k.wav"]

    def test_persistence_round_trip(self, tmp_path):
        directory = tmp_path / "ctx"
        _make_corpus(str(directory), 2)
        cfg = TiresiasConfig(
            contexts=(ContextConfig(name="c", directory=str(directory)),),
            data_dir=str(tmp_path / "data"),
        )
        with Tiresias(cfg, restore=False) as eng:
            eng.sync()
            uuids = {a.uuid for a in eng.get_audios("c")}
        # fresh engine restores from checkpoint (fp_init restore path)
        eng2 = Tiresias(cfg)
        assert {a.uuid for a in eng2.get_audios("c")} == uuids


class TestReload:
    """Live config reload (extension — the reference requires unload/load,
    /root/reference/src/app_tiresias.c:608-614)."""

    def test_reload_adds_and_removes_contexts(self, tmp_path):
        from tiresias_tpu.config import DspConfig

        d1, d2 = tmp_path / "a", tmp_path / "b"
        d1.mkdir(); d2.mkdir()
        write_wav(str(d1 / "one.wav"), synth_tone(440, 0.5, SR), SR)
        write_wav(str(d2 / "two.wav"), synth_tone(880, 0.5, SR), SR)
        cfg1 = TiresiasConfig(
            contexts=(ContextConfig("a", str(d1)),),
            data_dir=str(tmp_path / "data"),
        )
        eng = Tiresias(cfg1, restore=False)
        assert eng.sync().created == 1
        # reload: context a dropped, context b added
        cfg2 = TiresiasConfig(
            contexts=(ContextConfig("b", str(d2)),),
            data_dir=str(tmp_path / "data"),
        )
        report = eng.reload(cfg2)
        assert report.created == 1
        assert [c["name"] for c in eng.get_contexts()] == ["b"]
        assert not eng.get_audios("a")
        # DSP changes are rejected — stored fingerprints would be stale
        cfg3 = TiresiasConfig(
            dsp=DspConfig(n_coefs=4),
            contexts=cfg2.contexts,
            data_dir=cfg2.data_dir,
        )
        with pytest.raises(ValueError, match="DSP"):
            eng.reload(cfg3)
        # data_dir changes are rejected — the store and checkpoint_dir are
        # bound to the old directory; accepting would checkpoint wrongly
        cfg4 = TiresiasConfig(
            contexts=cfg2.contexts, data_dir=str(tmp_path / "other")
        )
        with pytest.raises(ValueError, match="data_dir"):
            eng.reload(cfg4)
        eng.close()


class TestWarmSearchMaps:
    def test_warmup_prebuilds_value_maps(self, tmp_path):
        """A restored engine's warmup must leave every view's lattice map
        built, so the first real request never pays the chunked build."""
        rng = np.random.default_rng(11)
        cfg = TiresiasConfig(data_dir=str(tmp_path / "data"))
        eng = Tiresias(cfg, restore=False)
        eng.create_context("c")
        for i in range(5):
            fp = rng.normal(0, 5, size=(40, 2)).astype(np.float32)
            eng.store.add_audio(f"t{i}", "c", fp, f"h{i:04d}")
        eng.warm_search_maps()
        views = eng.store.search_views()
        assert views and all(v.value_map is not None for v in views)
        # idempotent: the cached map object is reused, not rebuilt
        before = [v.value_map for v in views]
        eng.warm_search_maps()
        after = [v.value_map for v in eng.store.search_views()]
        assert all(a is b for a, b in zip(after, before))
        eng.close()

    def test_warmup_empty_store_is_noop(self, tmp_path):
        eng = Tiresias(
            TiresiasConfig(data_dir=str(tmp_path / "d")), restore=False
        )
        eng.warm_search_maps()  # must not raise on a storeless engine
        eng.warmup()
        eng.close()
