"""GCN side-data loading + full span pipeline with DualGCN inputs."""

import json

import jax
import numpy as np

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.datasets import SpanDataset, iterate_batches, load_gcn_arrays
from mtvaf_tpu.data.synthetic import make_span_file, make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_span_model_params
from mtvaf_tpu.train.trainer_span import SpanTrainer


def make_gcn_json(path, n, max_len=8, seed=0):
    rng = np.random.RandomState(seed)
    records = []
    for _ in range(n):
        L = int(rng.randint(4, max_len))
        adj = (rng.rand(L, L) > 0.6).astype(float).tolist()
        records.append({
            "adj_matrix": adj,
            "src_mask": [1] * L,
            "aspect_mask": [0] * (L - 1) + [1],
            "polarity": int(rng.randint(0, 3)),
        })
    with open(path, "w") as f:
        json.dump(records, f)


def test_load_gcn_arrays(tmp_path):
    vocab = tmp_path / "vocab.txt"
    make_vocab_file(str(vocab))
    tok = FullTokenizer(str(vocab))
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 6, seed=0, max_len=8)
    gcn_f = tmp_path / "gcn.json"
    make_gcn_json(str(gcn_f), 6)

    cfg = Config(dataset_name="twitter15", max_seq=24, num_layers=1,
                 max_answer_length=4, n_best_size=6, bf16=False)
    ds = SpanDataset.load(cfg, tok, str(train_f), gcn_file=str(gcn_f))
    assert ds.arrays["adj_matrix"].shape == (len(ds), 24, 24)
    assert ds.arrays["src_mask"].shape == (len(ds), 24)
    assert ds.arrays["polaritys"].shape == (len(ds),)


def test_span_trainer_with_gcn_data(tmp_path):
    vocab = tmp_path / "vocab.txt"
    make_vocab_file(str(vocab))
    tok = FullTokenizer(str(vocab))
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 6, seed=1, max_len=8)
    gcn_f = tmp_path / "gcn.json"
    make_gcn_json(str(gcn_f), 6, seed=1)

    cfg = Config(dataset_name="twitter15", max_seq=24, num_layers=1,
                 train_batch_size=2, eval_batch_size=2, num_epochs=1,
                 eval_begin_epoch=99, max_answer_length=4, n_best_size=6,
                 bf16=False, lr=1e-3)
    bert_cfg = BertConfig.tiny(vocab_size=len(tok.vocab))
    ds = SpanDataset.load(cfg, tok, str(train_f), gcn_file=str(gcn_f))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                          dev_dataset=ds, test_dataset=ds)
    trainer.train()  # exercises the dualgcn tat_loss + penal path per step


def test_span_trainer_gcn_cfg_without_side_file(tmp_path):
    """--gcn_layer_number with NO GCN side file (the CLI silently drops a
    missing one): training skips the re-encode and evaluate() must not
    crash on the missing adjacency key."""
    vocab = tmp_path / "vocab.txt"
    make_vocab_file(str(vocab))
    tok = FullTokenizer(str(vocab))
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 4, seed=3, max_len=8)

    cfg = Config(dataset_name="twitter15", max_seq=24, gcn_layer_number=1,
                 train_batch_size=2, eval_batch_size=2, num_epochs=1,
                 eval_begin_epoch=1, max_answer_length=4, n_best_size=6,
                 bf16=False, save_path=str(tmp_path / "out"))
    ds = SpanDataset.load(cfg, tok, str(train_f))      # no gcn_file
    params = init_span_model_params(jax.random.PRNGKey(0), cfg,
                                    BertConfig.tiny(vocab_size=len(tok.vocab)))
    trainer = SpanTrainer(cfg, BertConfig.tiny(vocab_size=len(tok.vocab)),
                          params, train_dataset=ds, dev_dataset=ds,
                          test_dataset=ds)
    trainer.train()                                    # incl. evaluate()
