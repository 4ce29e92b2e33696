"""RoBERTa backbone end-to-end: byte-level BPE tokenizer → span pipeline
(north-star config 4: RoBERTa-base multi-level alignment)."""

import os

import jax
import pytest

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.datasets import SpanDataset
from mtvaf_tpu.data.synthetic import make_roberta_vocab, make_span_file
from mtvaf_tpu.data.tokenization import ByteLevelBPETokenizer, build_tokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_span_model_params
from mtvaf_tpu.train.trainer_span import SpanTrainer


@pytest.fixture(scope="module")
def roberta_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("roberta-base"))
    make_roberta_vocab(d)
    return d


def test_build_tokenizer_dispatch(roberta_dir):
    # "roberta" in the path routes to byte-level BPE
    # (reference modules/dataset.py:20-23 dispatches the same way).
    assert "roberta" in roberta_dir
    tok = build_tokenizer(roberta_dir)
    assert isinstance(tok, ByteLevelBPETokenizer)
    toks = tok.tokenize("the fox")
    assert toks[0] == "t"
    assert any(t.startswith("Ġ") for t in toks)


def test_roberta_span_pipeline(tmp_path, roberta_dir):
    tok = ByteLevelBPETokenizer(os.path.join(roberta_dir, "vocab.json"),
                                os.path.join(roberta_dir, "merges.txt"))
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 8, seed=0, max_len=8)
    cfg = Config(dataset_name="twitter15", bert_name="roberta-local",
                 max_seq=64, train_batch_size=4, eval_batch_size=4,
                 num_epochs=1, eval_begin_epoch=1, n_best_size=8,
                 max_answer_length=4, bf16=False, lr=1e-3,
                 save_path=str(tmp_path / "out"))
    assert cfg.is_roberta
    bert_cfg = BertConfig.tiny(is_roberta=True, vocab_size=len(tok.vocab))
    ds = SpanDataset.load(cfg, tok, str(train_f))
    # features carry <s>/</s> specials
    assert ds.features[0].tokens[0] == "<s>"
    assert ds.features[0].tokens[-1] == "</s>"
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                          dev_dataset=ds, test_dataset=ds)
    trainer.train()
    f1 = trainer.test()
    assert 0.0 <= f1 <= 1.0
