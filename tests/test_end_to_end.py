"""End-to-end smoke tests: synthetic data → trainer → metrics, both pipelines."""

import os

import numpy as np
import pytest

import jax

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.datasets import CrfDataset, SpanDataset
from mtvaf_tpu.data.synthetic import (make_crf_files, make_span_file,
                                      make_vocab_file)
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params, init_span_model_params
from mtvaf_tpu.train.trainer_crf import CrfTrainer
from mtvaf_tpu.train.trainer_span import SpanTrainer


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    path = os.path.join(d, "vocab.txt")
    make_vocab_file(path)
    return FullTokenizer(path)


def test_span_pipeline_end_to_end(tmp_path, tokenizer):
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 12, seed=0)
    cfg = Config(dataset_name="twitter15", max_seq=32, train_batch_size=4,
                 eval_batch_size=4, num_epochs=2, eval_begin_epoch=1,
                 n_best_size=8, max_answer_length=4, bf16=False,
                 save_path=str(tmp_path / "out"), lr=1e-3)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = SpanDataset.load(cfg, tokenizer, str(train_f))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                          dev_dataset=ds, test_dataset=ds)
    trainer.train()
    assert trainer.best_dev_epoch is not None
    f1 = trainer.test()
    assert 0.0 <= f1 <= 1.0
    assert os.path.exists(tmp_path / "out" / "best_model.npz")
    assert os.path.exists(tmp_path / "out" / "dev_predictions.json")


def test_crf_pipeline_end_to_end(tmp_path, tokenizer):
    tsv = tmp_path / "train.txt"
    anp = tmp_path / "anp.json"
    make_crf_files(str(tsv), str(anp), 12, seed=0, num_anp=8)
    cfg = Config(dataset_name="twitter2015", max_seq=32, train_batch_size=4,
                 eval_batch_size=4, num_epochs=2, eval_begin_epoch=1,
                 bf16=False, num_anp_classes=8,
                 save_path=str(tmp_path / "out2"), lr=1e-3)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                         dev_dataset=ds, test_dataset=ds)
    trainer.train()
    assert trainer.best_dev_epoch is not None
    assert os.path.exists(tmp_path / "out2" / "best_model.npz")


def test_span_pipeline_with_augment(tmp_path, tokenizer):
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 8, seed=1)
    cfg = Config(dataset_name="twitter15", max_seq=32, train_batch_size=4,
                 eval_batch_size=4, num_epochs=1, eval_begin_epoch=99,
                 n_best_size=8, max_answer_length=4, bf16=False,
                 do_aug=True, aug_type="token_cutoff", lr=1e-3)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = SpanDataset.load(cfg, tokenizer, str(train_f))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                          dev_dataset=ds, test_dataset=ds)
    trainer.train()


def test_crf_pipeline_with_grad_accumulation(tmp_path, tokenizer):
    """gradient_accumulation_steps > 1 micro-batches the step via scan."""
    from mtvaf_tpu.data.synthetic import make_crf_files
    tsv = tmp_path / "train.txt"
    anp = tmp_path / "anp.json"
    make_crf_files(str(tsv), str(anp), 8, seed=3, num_anp=8)
    cfg = Config(dataset_name="twitter2015", max_seq=24, train_batch_size=4,
                 eval_batch_size=4, num_epochs=1, eval_begin_epoch=99,
                 bf16=False, num_anp_classes=8, lr=1e-3,
                 gradient_accumulation_steps=2)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                         dev_dataset=ds, test_dataset=ds)
    trainer.train()
    assert int(trainer.state.step) == 2  # 8 ex / batch 4 = 2 steps


def test_span_accum_train_f1_from_predictions(tmp_path, tokenizer,
                                              monkeypatch):
    """With gradient accumulation the train metrics must come from the
    model's ac_logits, not the gold-label fallback (round-1 verdict: the
    accum step used to return only {'loss'}, silently inflating train-F1
    to the 1.0 oracle)."""
    from mtvaf_tpu.train import trainer_span as ts

    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 8, seed=5)
    cfg = Config(dataset_name="twitter15", max_seq=32, train_batch_size=4,
                 eval_batch_size=4, num_epochs=1, eval_begin_epoch=99,
                 n_best_size=8, max_answer_length=4, bf16=False,
                 gradient_accumulation_steps=2, lr=1e-4)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = SpanDataset.load(cfg, tokenizer, str(train_f))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds)

    captured = {}
    real_eval_absa = ts.eval_absa

    def spy(examples, features, results, do_lower_case, **kw):
        out = real_eval_absa(examples, features, results, do_lower_case, **kw)
        captured["metrics"] = out[0]
        return out

    monkeypatch.setattr(ts, "eval_absa", spy)
    trainer.train()
    # a random-init tiny model cannot reproduce the gold polarities; the
    # gold fallback would report exactly p = r = f1 = 1.0.
    assert captured["metrics"]["f1"] < 1.0


def test_pack_and_put_roundtrip():
    """Single-buffer batch upload restores every leaf bit-exactly."""
    import jax.numpy as jnp
    from mtvaf_tpu.train.trainer_span import pack_and_put

    rng = np.random.RandomState(0)
    batch = {
        "ids": rng.randint(-2**31, 2**31 - 1, (4, 7)).astype(np.int32),
        "mask": rng.rand(4, 7).astype(np.float32),
        "odd": rng.randint(0, 2, (3,)).astype(np.int32),
        "flags": rng.rand(5) < 0.5,
        "wide": rng.randn(2, 3, 5).astype(np.float32),
        "already_dev": jnp.arange(6).reshape(2, 3),
    }
    out = pack_and_put(batch)
    for k, v in batch.items():
        got = np.asarray(out[k])
        if k == "already_dev":
            assert out[k] is batch[k]
            continue
        assert got.dtype == v.dtype and got.shape == v.shape, k
        np.testing.assert_array_equal(got, v, err_msg=k)


def test_span_eval_loss_non_divisible_matches_unpadded(tmp_path, tokenizer):
    """Logged dev/test loss on an eval set NOT divisible by eval_batch_size
    must follow the reference semantics exactly: a mean of per-batch means
    where the tail batch is its true (smaller) size — the padded duplicate
    rows must not enter the loss (the reference's last DataLoader batch is
    smaller, modules/train.py:197-199)."""
    import jax.numpy as jnp

    from mtvaf_tpu.data.datasets import iterate_batches
    from mtvaf_tpu.eval.span_decode import batch_eval_candidates

    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 10, seed=3)          # 10 % 4 != 0
    cfg = Config(dataset_name="twitter15", max_seq=32, train_batch_size=4,
                 eval_batch_size=4, num_epochs=1, eval_begin_epoch=99,
                 n_best_size=8, max_answer_length=4, bf16=False,
                 logit_threshold=-100.0, lr=1e-3)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = SpanDataset.load(cfg, tokenizer, str(train_f))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                          dev_dataset=ds, test_dataset=ds)

    _, got_loss = trainer._predict(ds, compute_loss=True)

    # expected: per-batch losses computed on the exact (unpadded) slices
    eval_params = trainer._eval_params()
    losses = []
    for batch in iterate_batches(ds.arrays, cfg.eval_batch_size):
        n = int(batch.pop("batch_valid").sum())
        batch = {k: v[:n] for k, v in batch.items()}
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        s, e, seq, cap = trainer.extraction_step(eval_params, dev)
        ss, se, labels, masks = batch_eval_candidates(
            ds.examples, ds.features, batch["example_index"],
            np.asarray(s), np.asarray(e), cfg)
        pack = jnp.asarray(np.stack([ss, se, labels, masks]), jnp.int32)
        _, loss = trainer.eval_loss_step(eval_params, dev, seq, s, e, cap,
                                         pack)
        losses.append(float(loss))
    assert len(losses) == 3          # 4 + 4 + 2
    assert got_loss == pytest.approx(sum(losses) / len(losses), rel=1e-5)


def test_crf_eval_loss_non_divisible_matches_unpadded(tmp_path, tokenizer):
    """CRF-pipeline twin of the span test above: the logged eval loss on a
    non-divisible eval set slices the padded tail batch to its true rows
    (reference SATrainer2 dev loss, modules/train.py:227-229)."""
    import jax.numpy as jnp

    from mtvaf_tpu.data.datasets import iterate_batches

    tsv, anp = tmp_path / "t.txt", tmp_path / "a.json"
    make_crf_files(str(tsv), str(anp), 10, seed=5, num_anp=8)   # 10 % 4 != 0
    cfg = Config(dataset_name="twitter2015", max_seq=32, train_batch_size=4,
                 eval_batch_size=4, num_epochs=1, eval_begin_epoch=99,
                 bf16=False, num_anp_classes=8, lr=1e-3)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                         dev_dataset=ds, test_dataset=ds)

    _, _, got_loss = trainer._predict(ds)

    eval_params = trainer._eval_params()
    losses = []
    for batch in iterate_batches(ds.arrays, cfg.eval_batch_size):
        n = int(batch.pop("batch_valid").sum())
        dev = {k: jnp.asarray(v[:n]) for k, v in batch.items()}
        losses.append(float(trainer.decode_step(eval_params, dev)["loss"]))
    assert len(losses) == 3
    assert got_loss == pytest.approx(sum(losses) / len(losses), rel=1e-5)
