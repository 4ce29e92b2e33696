"""Learning-dynamics integration tests: on a synthetic task with a learnable
rule (sentiment word determines the adjacent aspect's polarity), training
must actually reduce loss and reach high F1 — catching any wiring bug a
forward-only smoke test would miss."""

import jax
import numpy as np
import pytest

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.datasets import CrfDataset, SpanDataset
from mtvaf_tpu.data.synthetic import (make_learnable_crf_files,
                                      make_learnable_span_file,
                                      make_vocab_file)
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params, init_span_model_params
from mtvaf_tpu.train.trainer_crf import CrfTrainer
from mtvaf_tpu.train.trainer_span import SpanTrainer


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    make_vocab_file(str(p))
    return FullTokenizer(str(p))


def test_span_pipeline_learns(tmp_path, tokenizer):
    train_f = tmp_path / "train.txt"
    dev_f = tmp_path / "dev.txt"
    make_learnable_span_file(str(train_f), 64, seed=0)
    make_learnable_span_file(str(dev_f), 32, seed=99)
    cfg = Config(dataset_name="twitter15", max_seq=16, train_batch_size=8,
                 eval_batch_size=8, num_epochs=18, eval_begin_epoch=16,
                 n_best_size=6, max_answer_length=2, logit_threshold=0.0,
                 bf16=False, lr=2e-3, warmup_ratio=0.1,
                 save_path=str(tmp_path / "out"))
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab),
                               num_hidden_layers=2)
    train_ds = SpanDataset.load(cfg, tokenizer, str(train_f))
    dev_ds = SpanDataset.load(cfg, tokenizer, str(dev_f))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=train_ds,
                          dev_dataset=dev_ds, test_dataset=dev_ds)
    trainer.train()
    dev_f1 = trainer.best_dev_metric
    assert dev_f1 > 0.5, f"span pipeline failed to learn: dev f1 {dev_f1}"


def test_crf_pipeline_learns(tmp_path, tokenizer):
    tsv = tmp_path / "train.txt"
    anp = tmp_path / "anp.json"
    dev_tsv = tmp_path / "dev.txt"
    dev_anp = tmp_path / "dev_anp.json"
    make_learnable_crf_files(str(tsv), str(anp), 64, seed=0)
    make_learnable_crf_files(str(dev_tsv), str(dev_anp), 32, seed=99)
    cfg = Config(dataset_name="twitter2015", max_seq=16, train_batch_size=8,
                 eval_batch_size=8, num_epochs=25, eval_begin_epoch=25,
                 bf16=False, num_anp_classes=8, lr=3e-3, warmup_ratio=0.1,
                 save_path=str(tmp_path / "out2"))
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab),
                               num_hidden_layers=2)
    train_ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp))
    dev_ds = CrfDataset.load(cfg, tokenizer, str(dev_tsv), str(dev_anp))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=train_ds,
                         dev_dataset=dev_ds, test_dataset=dev_ds)
    trainer.train()
    dev_f1 = trainer.best_dev_metric
    assert dev_f1 > 0.5, f"crf pipeline failed to learn: dev f1 {dev_f1}"
