"""Full-trainer end-to-end oracle: the reference's OWN ``SATrainer2.train()``
(/root/reference/modules/train.py:541-694) run to completion on CPU against
``CrfTrainer`` on identical synthetic data, identical initial weights and
identical schedule — the complete per-epoch trajectory the reference would
report must match:

* per-epoch train F1 (reference: seqeval report parsed by string-slicing,
  modules/train.py:667-669 — here fed by our format-identical report),
* per-epoch dev F1 / dev loss and test F1 (modules/train.py:694-866),
* per-epoch mean train loss,
* best-dev epoch + metric (the ``>=`` update rule, modules/train.py:748),
* the final-epoch test that reloads ``best_model`` (modules/train.py:776-781)
  vs our CLI-equivalent ``test(load_best_model=True)``,
* the ``dev_predictions.json`` artifact (eval_json, eval_metrics.py:126-170).

This is the deepest accuracy-parity evidence available in this image (the
real Twitter data is not redistributable): not just N steps of optimizer
semantics (test_reference_oracle) but the reference's actual trainer loop —
batching order, scheduler stepping, metric row collection, eval gating and
best-model selection — executed by the reference's own code.

Both sides run deterministically: every torch dropout is set to p=0 and our
trainer runs with ``Config.deterministic`` (no RNG reaches the step).
"""

import json
import os
from collections import defaultdict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from reference_stubs import (import_reference_models,
                             import_reference_trainer, reference_available)

from mtvaf_tpu.core.config import CRF_LABEL_LIST, Config
from mtvaf_tpu.core.convert import bert_params_from_torch
from mtvaf_tpu.data.datasets import CrfDataset, iterate_batches
from mtvaf_tpu.data.synthetic import make_crf_files, make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.train.trainer_crf import CrfTrainer

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not present")

N_TRAIN, N_EVAL, BATCH, EPOCHS = 16, 8, 4, 3
LR, WARMUP = 1e-3, 0.25


class _Recorder:
    """tensorboardX-shaped scalar sink (both trainers log through it)."""

    def __init__(self):
        self.scalars = defaultdict(list)

    def add_scalar(self, tag=None, scalar_value=None, global_step=None, **kw):
        self.scalars[tag].append(float(scalar_value))


class _RefLoader:
    """Feeds the reference trainer OUR batch stream: each ``__iter__`` walks
    ``iterate_batches`` with the same (seed, epoch) the CrfTrainer uses, so
    both trainers consume bit-identical batches in the same order (the
    reference's RandomSampler is replaced by our seeded permutation — the
    comparison pins the trainers, not the samplers)."""

    def __init__(self, arrays, batch_size, shuffle, seed):
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        n = len(arrays["input_ids"])
        assert n % batch_size == 0, "divisible sizes keep the two loops equal"
        self.n_batches = n // batch_size

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        if self.shuffle:
            self.epoch += 1     # CrfTrainer epochs run 1..N
        for b in iterate_batches(self.arrays, self.batch_size,
                                 shuffle=self.shuffle, seed=self.seed,
                                 epoch=self.epoch):
            yield (torch.tensor(b["input_ids"], dtype=torch.long),
                   torch.tensor(b["input_mask"], dtype=torch.long),
                   torch.tensor(b["segment_ids"], dtype=torch.long),
                   torch.tensor(b["label_ids"], dtype=torch.long))


def _ref_args(save_path):
    import types
    return types.SimpleNamespace(
        prefix_dim=800, prefix_len=4, bert_name="bert-base-uncased",
        use_prefix=False, use_152=False, use_101=False, use_34=False,
        use_18=False, resnet_root=None, gcn_layer_number=0, num_layers=0,
        use_probe=False, n_gpu=1, device="cpu", vao=False, noauxloss=False,
        alpha=0.25, beta=0.5, num_epochs=EPOCHS, eval_begin_epoch=1,
        gradient_accumulation_steps=1, train_batch_size=BATCH,
        eval_batch_size=BATCH, lr=LR, warmup_ratio=WARMUP, load_path=None,
        use_pretrained=False, local_rank=-1, save_path=save_path)


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp("trainer_e2e")

    # ---- shared synthetic data through OUR pipeline (feature conversion is
    # separately golden-tested to match the reference's converter) ----
    vocab = os.path.join(d, "vocab.txt")
    make_vocab_file(vocab)
    tok = FullTokenizer(vocab)
    files = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        tsv = os.path.join(d, f"{split}.txt")
        anp = os.path.join(d, f"{split}_anp.json")
        make_crf_files(tsv, anp, n, seed=seed, num_anp=8)
        files[split] = (tsv, anp)

    cfg = Config(dataset_name="twitter2015", max_seq=32,
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 num_anp_classes=8, optimizer_mu_bf16=False,
                 save_path=os.path.join(d, "ours"))
    datasets = {s: CrfDataset.load(cfg, tok, tsv, anp)
                for s, (tsv, anp) in files.items()}

    # ≥7 layers: the reference forward unconditionally indexes
    # hidden_states[7] (models/bert_model.py:503) even with the probe off.
    bert_cfg = BertConfig.tiny(vocab_size=len(tok.vocab),
                               num_hidden_layers=7)
    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=bert_cfg.hidden_size,
        num_hidden_layers=bert_cfg.num_hidden_layers,
        num_attention_heads=bert_cfg.num_attention_heads,
        intermediate_size=bert_cfg.intermediate_size,
        max_position_embeddings=bert_cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")

    # ---- reference trainer, its own code end-to-end ----
    mp = pytest.MonkeyPatch()
    mp.setattr(ref.BertModel, "from_pretrained",
               classmethod(lambda cls, name, *a, **k: cls(hf_cfg)))
    try:
        torch.manual_seed(3)
        args = _ref_args(os.path.join(d, "ref"))
        model = ref.TVNetSAModel2(list(CRF_LABEL_LIST), tokenizer=None,
                                  args=args)
    finally:
        mp.undo()
    for m in model.modules():            # deterministic: no dropout anywhere
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    # Converted initial weights → our params, snapshotted BEFORE the
    # reference trains.  np.array copies are load-bearing: .numpy() views
    # torch storage and jnp.asarray zero-copies host memory on CPU, so
    # without them the reference's in-place optimizer steps would mutate
    # our "initial" weights (see core/convert._np).
    def _c(t):
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(),
                                       bert_cfg.num_hidden_layers),
        "fc": {"kernel": _c(model.fc.weight).T, "bias": _c(model.fc.bias)},
        "crf": {
            "start": _c(model.crf.start_transitions),
            "end": _c(model.crf.end_transitions),
            "transitions": _c(model.crf.transitions),
        },
    }

    import types as _types
    label_map = {label: i for i, label in enumerate(CRF_LABEL_LIST, 1)}
    ref_writer = _Recorder()
    import logging
    ref_trainer = rt.SATrainer2(
        train_data=_RefLoader(datasets["train"].arrays, BATCH, True, cfg.seed),
        dev_data=_RefLoader(datasets["dev"].arrays, BATCH, False, cfg.seed),
        test_data=_RefLoader(datasets["test"].arrays, BATCH, False, cfg.seed),
        model=model, label_map=label_map, args=args,
        logger=logging.getLogger("ref_e2e"), writer=ref_writer,
        dev_dataset=_types.SimpleNamespace(
            examples=datasets["dev"].examples,
            features=datasets["dev"].features),
        test_dataset=_types.SimpleNamespace(
            examples=datasets["test"].examples,
            features=datasets["test"].features))
    ref_trainer.train()

    # ---- our trainer on the same data/weights/schedule ----
    our_writer = _Recorder()
    with jax.default_matmul_precision("highest"):
        trainer = CrfTrainer(cfg, bert_cfg, params,
                             train_dataset=datasets["train"],
                             dev_dataset=datasets["dev"],
                             test_dataset=datasets["test"],
                             writer=our_writer)
        trainer.train()
        # the reference's final-epoch test reloads best_model
        # (modules/train.py:776-781); our CLI does the same after train()
        final_test_f1 = trainer.test(EPOCHS, load_best_model=True)

    return {"ref": ref_trainer, "ref_writer": ref_writer, "ours": trainer,
            "our_writer": our_writer, "final_test_f1": final_test_f1,
            "ref_dir": args.save_path, "our_dir": cfg.save_path}


def _round4(xs):
    return [round(float(x), 4) for x in xs]


def test_train_f1_trajectory(e2e):
    ref_f1 = e2e["ref_writer"].scalars["train_f1"]
    our_f1 = e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)


def test_train_loss_trajectory(e2e):
    # reference logs 2-step averages (refresh_step=2, modules/train.py:552);
    # ours logs the epoch mean — aggregate the reference's to epoch means.
    ref_losses = e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2     # refresh values per epoch
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    our_epoch = e2e["our_writer"].scalars["train_loss"]
    np.testing.assert_allclose(our_epoch, ref_epoch, rtol=2e-4)
    # the model must actually be learning for the comparison to bind
    assert ref_epoch[-1] < ref_epoch[0]


def test_dev_trajectory_and_best_selection(e2e):
    ref_dev = e2e["ref_writer"].scalars["dev_f1"]
    our_dev = e2e["our_writer"].scalars["dev_f1"]
    assert len(ref_dev) == len(our_dev) == EPOCHS
    assert _round4(ref_dev) == _round4(our_dev)
    np.testing.assert_allclose(e2e["our_writer"].scalars["dev_loss"],
                               e2e["ref_writer"].scalars["dev_loss"],
                               rtol=2e-4)
    assert e2e["ours"].best_dev_epoch == e2e["ref"].best_dev_epoch
    assert round(e2e["ours"].best_dev_metric, 4) == round(
        e2e["ref"].best_dev_metric, 4)


def test_test_trajectory_and_best_reload(e2e):
    ref_test = e2e["ref_writer"].scalars["test_f1"]
    our_test = e2e["our_writer"].scalars["test_f1"]
    assert len(ref_test) == EPOCHS
    # epochs 1..N-1 run on current params on both sides; the reference's
    # final-epoch test reloads best_model.pth — compare it to our
    # load_best_model test (the CLI-equivalent final report).
    assert _round4(ref_test[:-1]) == _round4(our_test[:EPOCHS - 1])
    assert round(float(ref_test[-1]), 4) == round(e2e["final_test_f1"], 4)


def test_dev_predictions_artifact(e2e):
    with open(os.path.join(e2e["ref_dir"], "dev_predictions.json")) as f:
        ref_pred = json.load(f)
    with open(os.path.join(e2e["our_dir"], "dev_predictions.json")) as f:
        our_pred = json.load(f)
    assert our_pred == ref_pred


# ===========================================================================
# Pipeline A: the reference's own SATrainer.train() (modules/train.py:63-178)
# run to completion vs SpanTrainer — per-epoch train loss/F1 (train F1 goes
# through the reference's per-step span_annotate_candidates train branch +
# eval_absa, modules/train.py:122-146), dev F1 + best-dev selection
# (modules/train.py:235-238), the prediction artifacts, and the final
# SATrainer.test() that reloads best_model (modules/train.py:258-261).
# The reference's dev LOSS has no counterpart here (our eval seam never
# computes a loss over eval-branch candidates) — dev selection is on F1 on
# both sides, so nothing observable depends on it.


class _RefSpanLoader:
    """Feeds the reference SATrainer OUR span batch stream as the 8-tuple
    its text-only `_step` unpacks (modules/train.py:363-369), with the same
    (seed, epoch) walk the SpanTrainer uses."""

    KEYS = ("input_ids", "input_mask", "segment_ids", "example_index",
            "start_positions", "end_positions", "bio_labels",
            "polarity_positions")

    def __init__(self, arrays, batch_size, shuffle, seed):
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        n = len(arrays["input_ids"])
        assert n % batch_size == 0, "divisible sizes keep the two loops equal"
        self.n_batches = n // batch_size

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        if self.shuffle:
            self.epoch += 1
        for b in iterate_batches(self.arrays, self.batch_size,
                                 shuffle=self.shuffle, seed=self.seed,
                                 epoch=self.epoch):
            yield tuple(torch.tensor(b[k], dtype=torch.long)
                        for k in self.KEYS)


def _ref_span_args(cfg, save_path):
    import types
    return types.SimpleNamespace(
        prefix_dim=800, prefix_len=4, bert_name="bert-base-uncased",
        use_prefix=False, use_152=False, use_101=False, use_34=False,
        use_18=False, resnet_root=None, gcn_layer_number=0, num_layers=0,
        use_probe=False, n_gpu=1, device="cpu", vao=False, noauxloss=False,
        alpha=0.25, beta=0.5, num_epochs=EPOCHS, eval_begin_epoch=1,
        gradient_accumulation_steps=1, train_batch_size=BATCH,
        eval_batch_size=BATCH, lr=LR, warmup_ratio=WARMUP, load_path=None,
        use_pretrained=False, local_rank=-1, save_path=save_path,
        do_aug=False, do_lower_case=cfg.do_lower_case,
        verbose_logging=cfg.verbose_logging, filter_type=cfg.filter_type,
        use_heuristics=cfg.use_heuristics, use_nms=cfg.use_nms,
        logit_threshold=cfg.logit_threshold, n_best_size=cfg.n_best_size,
        max_answer_length=cfg.max_answer_length)


@pytest.fixture(scope="module")
def span_e2e(tmp_path_factory):
    from mtvaf_tpu.data.datasets import SpanDataset
    from mtvaf_tpu.data.synthetic import make_span_file
    from mtvaf_tpu.train.trainer_span import SpanTrainer

    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp("span_trainer_e2e")

    vocab = os.path.join(d, "vocab.txt")
    make_vocab_file(vocab)
    tok = FullTokenizer(vocab)
    # logit_threshold low enough that eval-branch candidates actually
    # survive the filters: at the default 8.0 a near-init model's batches
    # have zero unmasked candidates, the reference's ac-loss 0/0 makes the
    # logged dev loss NaN (quirk pinned in TestSpanEvalLossStep), and the
    # dev-loss trajectory comparison would only compare NaNs.
    cfg = Config(dataset_name="twitter15", max_seq=32,
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 optimizer_mu_bf16=False, max_answer_length=4,
                 logit_threshold=-50.0,
                 save_path=os.path.join(d, "ours"))
    datasets = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        f = os.path.join(d, f"{split}.txt")
        make_span_file(f, n, seed=seed, max_len=14)
        datasets[split] = SpanDataset.load(cfg, tok, f, mode=split)

    # ≥8 layers: TVNetSAModel.extraction taps hidden_states[7]
    # (models/bert_model.py:258-268).
    bert_cfg = BertConfig.tiny(vocab_size=len(tok.vocab),
                               num_hidden_layers=8)
    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=bert_cfg.hidden_size,
        num_hidden_layers=bert_cfg.num_hidden_layers,
        num_attention_heads=bert_cfg.num_attention_heads,
        intermediate_size=bert_cfg.intermediate_size,
        max_position_embeddings=bert_cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")

    mp = pytest.MonkeyPatch()
    mp.setattr(ref.BertModel, "from_pretrained",
               classmethod(lambda cls, name, *a, **k: cls(hf_cfg)))
    try:
        torch.manual_seed(7)
        args = _ref_span_args(cfg, os.path.join(d, "ref"))
        model = ref.TVNetSAModel(list(range(4)), tokenizer=None, args=args)
    finally:
        mp.undo()
    for m in model.modules():            # deterministic: no dropout anywhere
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    def _c(t):                           # owned copy (see crf fixture)
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    def _dense(lin):
        return {"kernel": _c(lin.weight).T, "bias": _c(lin.bias)}

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(),
                                       bert_cfg.num_hidden_layers),
        "dense": _dense(model.dense),
        "unary_affine": _dense(model.unary_affine),
        "binary_affine": _dense(model.binary_affine),
        "classifier": _dense(model.classifier),
    }

    import types as _types
    os.makedirs(args.save_path, exist_ok=True)
    ref_writer = _Recorder()
    import logging
    mk = lambda ds: _types.SimpleNamespace(
        examples=ds.examples, features=ds.features, img_path=None,
        data_dict=None, tokenizer=None, max_seq=cfg.max_seq)
    ref_trainer = rt.SATrainer(
        train_data=_RefSpanLoader(datasets["train"].arrays, BATCH, True,
                                  cfg.seed),
        dev_data=_RefSpanLoader(datasets["dev"].arrays, BATCH, False,
                                cfg.seed),
        test_data=_RefSpanLoader(datasets["test"].arrays, BATCH, False,
                                 cfg.seed),
        model=model, label_map=None, args=args,
        logger=logging.getLogger("ref_span_e2e"), writer=ref_writer,
        train_dataset=mk(datasets["train"]), dev_dataset=mk(datasets["dev"]),
        test_dataset=mk(datasets["test"]))
    ref_trainer.train()
    ref_test_f1 = ref_trainer.test()

    our_writer = _Recorder()
    with jax.default_matmul_precision("highest"):
        trainer = SpanTrainer(cfg, bert_cfg, params,
                              train_dataset=datasets["train"],
                              dev_dataset=datasets["dev"],
                              test_dataset=datasets["test"],
                              writer=our_writer)
        trainer.train()
        final_test_f1 = trainer.test(load_best_model=True)

    return {"ref": ref_trainer, "ref_writer": ref_writer, "ours": trainer,
            "our_writer": our_writer, "ref_test_f1": ref_test_f1,
            "final_test_f1": final_test_f1, "ref_dir": args.save_path,
            "our_dir": cfg.save_path}


def test_span_train_f1_trajectory(span_e2e):
    ref_f1 = span_e2e["ref_writer"].scalars["train_f1"]
    our_f1 = span_e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)
    # the comparison must bind: training has to actually move the metric
    assert max(ref_f1) > min(ref_f1) or max(ref_f1) > 0


def test_span_train_loss_trajectory(span_e2e):
    ref_losses = span_e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2     # refresh_step=2 values per epoch
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    our_epoch = span_e2e["our_writer"].scalars["train_loss"]
    np.testing.assert_allclose(our_epoch, ref_epoch, rtol=2e-4)
    assert ref_epoch[-1] < ref_epoch[0]


def test_span_dev_trajectory_and_best_selection(span_e2e):
    ref_dev = span_e2e["ref_writer"].scalars["dev_f1"]
    our_dev = span_e2e["our_writer"].scalars["dev_f1"]
    assert len(ref_dev) == len(our_dev) == EPOCHS
    assert _round4(ref_dev) == _round4(our_dev)
    assert span_e2e["ours"].best_dev_epoch == span_e2e["ref"].best_dev_epoch
    assert round(span_e2e["ours"].best_dev_metric, 4) == round(
        span_e2e["ref"].best_dev_metric, 4)


def test_span_test_with_best_reload(span_e2e):
    assert round(float(span_e2e["ref_test_f1"]), 4) == round(
        span_e2e["final_test_f1"], 4)


def test_span_dev_and_test_loss_trajectories(span_e2e):
    """The reference's span eval loop logs the full-forward loss on the
    eval-branch candidates per epoch (modules/train.py:197-199,227-229) and
    at test time (:301-305); the eval-loss step must reproduce both
    trajectories (PARITY deviation #13 closed)."""
    ref_dev = span_e2e["ref_writer"].scalars["dev_loss"]
    our_dev = span_e2e["our_writer"].scalars["dev_loss"]
    assert len(ref_dev) == len(our_dev) == EPOCHS
    np.testing.assert_allclose(our_dev, ref_dev, rtol=2e-4)
    np.testing.assert_allclose(span_e2e["our_writer"].scalars["test_loss"],
                               span_e2e["ref_writer"].scalars["test_loss"],
                               rtol=2e-4)


def test_span_prediction_artifacts(span_e2e):
    for name in ("train_predictions.json", "dev_predictions.json",
                 "test_predictions.json"):
        with open(os.path.join(span_e2e["ref_dir"], name)) as f:
            ref_pred = json.load(f)
        with open(os.path.join(span_e2e["our_dir"], name)) as f:
            our_pred = json.load(f)
        assert our_pred == ref_pred, name


# ===========================================================================
# RoBERTa backbone full-loop oracle: the reference's SATrainer2.train() with
# its forked RobertaModel (models/modeling_roberta.py — position ids from
# create_position_ids_from_input_ids with padding_idx=1 :1706-1718,
# type_vocab_size=1) run to completion vs CrfTrainer with an is_roberta
# config and byte-level BPE data.  The RoBERTa pathway previously had
# forward + 5-step oracles only (test_reference_oracle.py); this pins the
# complete trainer loop for config 4 of BASELINE.json.


@pytest.fixture(scope="module")
def roberta_e2e(tmp_path_factory):
    from mtvaf_tpu.data.synthetic import make_roberta_vocab
    from mtvaf_tpu.data.tokenization import build_tokenizer

    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp("trainer_e2e_roberta")

    rdir = os.path.join(d, "roberta-base")
    make_roberta_vocab(rdir)
    tok = build_tokenizer(rdir)

    files = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        tsv = os.path.join(d, f"{split}.txt")
        anp = os.path.join(d, f"{split}_anp.json")
        make_crf_files(tsv, anp, n, seed=seed, num_anp=8)
        files[split] = (tsv, anp)

    cfg = Config(dataset_name="twitter2015", bert_name=rdir, max_seq=32,
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 num_anp_classes=8, optimizer_mu_bf16=False,
                 save_path=os.path.join(d, "ours"))
    assert cfg.is_roberta
    datasets = {s: CrfDataset.load(cfg, tok, tsv, anp)
                for s, (tsv, anp) in files.items()}

    # >=7 layers: the reference forward indexes hidden_states[7]
    bert_cfg = BertConfig.tiny(is_roberta=True, vocab_size=len(tok.vocab),
                               num_hidden_layers=7)
    hf_cfg = transformers.RobertaConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=bert_cfg.hidden_size,
        num_hidden_layers=bert_cfg.num_hidden_layers,
        num_attention_heads=bert_cfg.num_attention_heads,
        intermediate_size=bert_cfg.intermediate_size,
        max_position_embeddings=bert_cfg.max_position_embeddings,
        type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")

    mp = pytest.MonkeyPatch()
    mp.setattr(ref.RobertaModel, "from_pretrained",
               classmethod(lambda cls, name, *a, **k: cls(hf_cfg)))
    try:
        torch.manual_seed(21)
        args = _ref_args(os.path.join(d, "ref"))
        args.bert_name = "roberta-base"   # reference dispatch: "roberta" in name
        model = ref.TVNetSAModel2(list(CRF_LABEL_LIST), tokenizer=None,
                                  args=args)
    finally:
        mp.undo()
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    def _c(t):
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(),
                                       bert_cfg.num_hidden_layers),
        "fc": {"kernel": _c(model.fc.weight).T, "bias": _c(model.fc.bias)},
        "crf": {
            "start": _c(model.crf.start_transitions),
            "end": _c(model.crf.end_transitions),
            "transitions": _c(model.crf.transitions),
        },
    }

    import types as _types
    label_map = {label: i for i, label in enumerate(CRF_LABEL_LIST, 1)}
    ref_writer = _Recorder()
    import logging
    ref_trainer = rt.SATrainer2(
        train_data=_RefLoader(datasets["train"].arrays, BATCH, True, cfg.seed),
        dev_data=_RefLoader(datasets["dev"].arrays, BATCH, False, cfg.seed),
        test_data=_RefLoader(datasets["test"].arrays, BATCH, False, cfg.seed),
        model=model, label_map=label_map, args=args,
        logger=logging.getLogger("ref_roberta_e2e"), writer=ref_writer,
        dev_dataset=_types.SimpleNamespace(
            examples=datasets["dev"].examples,
            features=datasets["dev"].features),
        test_dataset=_types.SimpleNamespace(
            examples=datasets["test"].examples,
            features=datasets["test"].features))
    ref_trainer.train()

    our_writer = _Recorder()
    with jax.default_matmul_precision("highest"):
        trainer = CrfTrainer(cfg, bert_cfg, params,
                             train_dataset=datasets["train"],
                             dev_dataset=datasets["dev"],
                             test_dataset=datasets["test"],
                             writer=our_writer)
        trainer.train()
        final_test_f1 = trainer.test(EPOCHS, load_best_model=True)

    return {"ref": ref_trainer, "ref_writer": ref_writer, "ours": trainer,
            "our_writer": our_writer, "final_test_f1": final_test_f1,
            "ref_dir": args.save_path, "our_dir": cfg.save_path}


def test_roberta_train_trajectories(roberta_e2e):
    ref_f1 = roberta_e2e["ref_writer"].scalars["train_f1"]
    our_f1 = roberta_e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)
    ref_losses = roberta_e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    np.testing.assert_allclose(roberta_e2e["our_writer"].scalars["train_loss"],
                               ref_epoch, rtol=2e-4)
    assert ref_epoch[-1] < ref_epoch[0]


def test_roberta_eval_trajectories_and_best(roberta_e2e):
    for tag in ("dev_f1", "test_f1"):
        ref_v = roberta_e2e["ref_writer"].scalars[tag]
        our_v = roberta_e2e["our_writer"].scalars[tag]
        if tag == "test_f1":   # reference's final-epoch test reloads best
            assert _round4(ref_v[:-1]) == _round4(our_v[:EPOCHS - 1])
            assert round(float(ref_v[-1]), 4) == round(
                roberta_e2e["final_test_f1"], 4)
        else:
            assert _round4(ref_v) == _round4(our_v)
    np.testing.assert_allclose(roberta_e2e["our_writer"].scalars["dev_loss"],
                               roberta_e2e["ref_writer"].scalars["dev_loss"],
                               rtol=2e-4)
    assert (roberta_e2e["ours"].best_dev_epoch
            == roberta_e2e["ref"].best_dev_epoch)


def test_roberta_dev_predictions_artifact(roberta_e2e):
    with open(os.path.join(roberta_e2e["ref_dir"],
                           "dev_predictions.json")) as f:
        ref_pred = json.load(f)
    with open(os.path.join(roberta_e2e["our_dir"],
                           "dev_predictions.json")) as f:
        our_pred = json.load(f)
    assert our_pred == ref_pred
