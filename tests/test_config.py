"""Config system: INI parsing and the reference's two-scope model
(/root/reference/src/app_tiresias.c:177-224, doc/configuration.rst)."""

import pytest

from tiresias_tpu.config import (
    DspConfig,
    TiresiasConfig,
    config_from_mapping,
    load_config,
)


class TestLoadConfig:
    def test_full_file(self, tmp_path):
        conf = tmp_path / "tiresias.conf"
        conf.write_text(
            "[global]\n"
            "tolerance=0.25\n"
            "coefs=2\n"
            "freq_ignore_low=100\n"
            "freq_ignore_high=3000\n"
            "trunc_coef1=no\n"
            "data_dir=/tmp/tir\n"
            "hop_size=128\n"
            "buf_size=256\n"
            "\n"
            "[music]\n"
            "directory=/srv/music\n"
            "\n"
            "[announcements]\n"
            "directory=/srv/ann\n"
        )
        cfg = load_config(str(conf))
        assert cfg.match.tolerance == 0.25
        assert cfg.match.coefs == 2
        assert cfg.match.freq_ignore_low == 100
        assert cfg.match.freq_ignore_high == 3000
        assert cfg.match.trunc_coef1 is False
        assert cfg.data_dir == "/tmp/tir"
        assert cfg.dsp.hop_size == 128 and cfg.dsp.buf_size == 256
        assert [c.name for c in cfg.contexts] == ["music", "announcements"]
        assert cfg.context("music").directory == "/srv/music"
        assert cfg.context("nope") is None

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            load_config("/nonexistent/tiresias.conf")

    def test_context_without_directory_ignored(self):
        # app_tiresias.c:299-304
        cfg = config_from_mapping(
            {"global": {}, "broken": {"foo": "bar"}, "ok": {"directory": "/x"}}
        )
        assert [c.name for c in cfg.contexts] == ["ok"]

    def test_defaults(self):
        cfg = config_from_mapping({})
        assert cfg.match.tolerance == 0.001  # fp_handler.c:41
        assert cfg.match.coefs == 1  # application_handler.c:180
        assert cfg.match.trunc_coef1 is True
        assert cfg.dsp.hop_size == 256 and cfg.dsp.buf_size == 512

    def test_trunc_coef1_spellings(self):
        for val, expected in [
            ("yes", True), ("1", True), ("on", True), ("TRUE", True),
            ("no", False), ("0", False), ("off", False), ("false", False),
        ]:
            cfg = config_from_mapping({"global": {"trunc_coef1": val}})
            assert cfg.match.trunc_coef1 is expected, val


class TestDspValidation:
    def test_buf_must_be_multiple_of_hop(self):
        with pytest.raises(ValueError):
            DspConfig(hop_size=200, buf_size=512)

    def test_coef_bounds(self):
        with pytest.raises(ValueError):
            DspConfig(n_coefs=0)
        with pytest.raises(ValueError):
            DspConfig(n_coefs=41)

    def test_data_dir_expansion(self):
        cfg = TiresiasConfig(data_dir="~/x")
        assert not cfg.expanded_data_dir.startswith("~")
