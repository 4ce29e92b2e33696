"""Config surface tests: flag parsing, validation, derived properties."""

import pytest

from mtvaf_tpu.core.config import Config, config_from_args


class TestValidation:
    def test_defaults_valid(self):
        Config()

    def test_unknown_dataset(self):
        with pytest.raises(ValueError, match="dataset_name"):
            Config(dataset_name="twitter99")

    def test_prefix_len_constraint(self):
        with pytest.raises(ValueError, match="prefix_len"):
            Config(use_prefix=True, prefix_len=10)

    def test_multiple_resnet_variants(self):
        with pytest.raises(ValueError, match="at most one"):
            Config(use_prefix=True, prefix_len=4, use_152=True, use_18=True)

    def test_aug_requires_type(self):
        with pytest.raises(ValueError, match="aug_type"):
            Config(do_aug=True)

    def test_filter_type(self):
        with pytest.raises(ValueError, match="filter_type"):
            Config(filter_type="bm25")


class TestDerived:
    def test_pipeline_routing(self):
        assert Config(dataset_name="twitter15").is_span_pipeline
        assert not Config(dataset_name="twitter2015").is_span_pipeline

    def test_roberta_detection(self):
        assert Config(bert_name="roberta-base").is_roberta
        assert not Config(bert_name="bert-base-uncased").is_roberta

    def test_resnet_depth_channels(self):
        assert Config().resnet_depth == 50
        assert Config(use_18=True).resnet_depth == 18
        assert Config(use_152=True).resnet_concat_channels == 3840
        assert Config(use_18=True).resnet_concat_channels == 960

    def test_effective_max_seq(self):
        assert Config().effective_max_seq == 128
        assert Config(use_align=True).effective_max_seq == 500


class TestCLIParsing:
    def test_basic_flags(self):
        cfg = config_from_args(["--dataset_name", "twitter2017",
                                "--lr", "1e-4", "--use_prefix", "--use_152",
                                "--num_epochs", "3"])
        assert cfg.dataset_name == "twitter2017"
        assert cfg.lr == pytest.approx(1e-4)
        assert cfg.use_prefix and cfg.use_152
        assert cfg.num_epochs == 3

    def test_no_flags_disable_default_true(self):
        cfg = config_from_args(["--no_bf16", "--no_use_pallas_attention"])
        assert not cfg.bf16
        assert not cfg.use_pallas_attention
        # defaults preserved otherwise
        assert config_from_args([]).bf16

    def test_optional_str(self):
        cfg = config_from_args(["--save_path", "/tmp/x", "--probe_ckpt",
                                "/tmp/p.pt"])
        assert cfg.save_path == "/tmp/x"
        assert cfg.probe_ckpt == "/tmp/p.pt"
