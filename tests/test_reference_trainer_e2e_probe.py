"""Full-trainer e2e oracle for the syntactic probe (SURVEY.md C13).

The reference's OWN ``SATrainer.train()`` with ``use_probe`` run to
completion on CPU against ``SpanTrainer --use_probe`` on identical data,
converted weights and schedule.  Forward parity of every probe stage is
pinned in test_reference_oracle / test_probe; this pins the TRAINING
dynamics the unit oracles can't see:

* the probe projection fine-tuning inside the plain-AdamW surface
  (requires_grad flipped on at models/bert_model.py:241-243, optimizer at
  modules/train.py:461-462),
* ``CombineLoss`` gating per step with the ``args.num_epochs`` decay
  constant (models/bert_model.py:311-316, probes/loss.py:13-18) feeding
  the backward — so the probe loss SHAPES the bert gradients,
* the per-epoch prob_loss / ori_loss accounting of the train loop
  (modules/train.py:100-121).

The probe hardcodes hidden_dim=768 (models/bert_model.py:279-281), so the
fixture runs a 768-hidden encoder — 8 layers (hidden_states[7] tap) with a
narrow FFN to keep CPU cost down.  Deterministic on both sides.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from reference_stubs import (import_reference_models,
                             import_reference_trainer, reference_available)

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.core.convert import bert_params_from_torch
from mtvaf_tpu.data.datasets import SpanDataset, iterate_batches
from mtvaf_tpu.data.synthetic import make_span_file, make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.train.trainer_span import SpanTrainer

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not present")

N_TRAIN, N_EVAL, BATCH, EPOCHS = 8, 4, 4, 2
LR, WARMUP = 1e-3, 0.25


class _Recorder:
    def __init__(self):
        from collections import defaultdict
        self.scalars = defaultdict(list)

    def add_scalar(self, tag=None, scalar_value=None, global_step=None, **kw):
        self.scalars[tag].append(float(scalar_value))


class _RefSpanLoader:
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
        assert n % batch_size == 0
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


def _ref_args(cfg, save_path):
    import types
    return types.SimpleNamespace(
        prefix_dim=800, prefix_len=4, bert_name="bert-base-uncased",
        use_prefix=False, use_152=False, use_101=False, use_34=False,
        use_18=False, resnet_root=None, gcn_layer_number=0, num_layers=0,
        use_probe=True, n_gpu=1, device="cpu", vao=False, noauxloss=False,
        alpha=cfg.alpha, beta=cfg.beta, num_epochs=EPOCHS,
        eval_begin_epoch=1, gradient_accumulation_steps=1,
        train_batch_size=BATCH, eval_batch_size=BATCH, lr=LR,
        warmup_ratio=WARMUP, load_path=None, use_pretrained=False,
        local_rank=-1, save_path=save_path, do_aug=False,
        do_lower_case=cfg.do_lower_case,
        verbose_logging=cfg.verbose_logging, filter_type=cfg.filter_type,
        use_heuristics=cfg.use_heuristics, use_nms=cfg.use_nms,
        logit_threshold=cfg.logit_threshold, n_best_size=cfg.n_best_size,
        max_answer_length=cfg.max_answer_length)


def _t(x):
    return np.array(x.detach().numpy(), copy=True)


def _dense(lin):
    return {"kernel": jnp.asarray(_t(lin.weight)).T,
            "bias": jnp.asarray(_t(lin.bias))}


@pytest.fixture(scope="module")
def probe_e2e(tmp_path_factory):
    import sys

    from reference_stubs import REFERENCE

    # probes/probe_trainModel.py uses flat intra-package imports
    # (`from probe import ...`), so the probes dir itself must be on
    # sys.path (same dance as test_reference_oracle's ref_probes).
    probes_dir = os.path.join(REFERENCE, "probes")
    if probes_dir not in sys.path:
        sys.path.insert(0, probes_dir)
    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp("probe_trainer_e2e")

    vocab = os.path.join(d, "vocab.txt")
    make_vocab_file(vocab)
    tok = FullTokenizer(vocab)
    cfg = Config(dataset_name="twitter15", max_seq=24,
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 optimizer_mu_bf16=False, max_answer_length=4,
                 use_probe=True, save_path=os.path.join(d, "ours"))
    datasets = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        f = os.path.join(d, f"{split}.txt")
        make_span_file(f, n, seed=seed, max_len=10)
        datasets[split] = SpanDataset.load(cfg, tok, f, mode=split)

    # probe hardcodes hidden 768; 8 layers for the hidden_states[7] tap,
    # narrow FFN keeps the CPU runtime sane
    bert_cfg = BertConfig.tiny(vocab_size=len(tok.vocab), hidden_size=768,
                               num_hidden_layers=8, num_attention_heads=12,
                               intermediate_size=256)
    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=768,
        num_hidden_layers=8, num_attention_heads=12, intermediate_size=256,
        max_position_embeddings=bert_cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")

    mp = pytest.MonkeyPatch()
    mp.setattr(ref.BertModel, "from_pretrained",
               classmethod(lambda cls, name, *a, **k: cls(hf_cfg)))
    try:
        torch.manual_seed(7)
        args = _ref_args(cfg, os.path.join(d, "ref"))
        model = ref.TVNetSAModel(list(range(4)), tokenizer=None, args=args)
    finally:
        mp.undo()
    for m in model.modules():             # deterministic: no dropout
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(),
                                       bert_cfg.num_hidden_layers),
        "dense": _dense(model.dense),
        "unary_affine": _dense(model.unary_affine),
        "binary_affine": _dense(model.binary_affine),
        "classifier": _dense(model.classifier),
        # probe wrapper: probe_trainModel.probe -> OneWordPSDProbe.proj
        # (hidden, rank), applied as matmul(batch, proj) on both sides
        "probe": {"proj": jnp.asarray(
            _t(model.oneWordpsdProbe.oneWordpsdProbe.proj))},
    }

    import logging
    import types as _types
    os.makedirs(args.save_path, exist_ok=True)
    ref_writer = _Recorder()
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
        logger=logging.getLogger("ref_probe_e2e"), writer=ref_writer,
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


def _round4(xs):
    return [round(float(x), 4) for x in xs]


def test_probe_loss_and_f1_trajectories(probe_e2e):
    ref_f1 = probe_e2e["ref_writer"].scalars["train_f1"]
    our_f1 = probe_e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)

    # the COMBINED loss (CombineLoss output) drives both backwards
    ref_losses = probe_e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2 or 1
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    our_epoch = probe_e2e["our_writer"].scalars["train_loss"]
    np.testing.assert_allclose(our_epoch, ref_epoch, rtol=2e-4)


def test_probe_dev_and_best(probe_e2e):
    ref_dev = probe_e2e["ref_writer"].scalars["dev_f1"]
    our_dev = probe_e2e["our_writer"].scalars["dev_f1"]
    assert _round4(ref_dev) == _round4(our_dev)
    assert probe_e2e["ours"].best_dev_epoch == probe_e2e["ref"].best_dev_epoch
    assert round(float(probe_e2e["ref_test_f1"]), 4) == round(
        probe_e2e["final_test_f1"], 4)


def test_probe_prediction_artifacts(probe_e2e):
    for name in ("dev_predictions.json", "test_predictions.json"):
        with open(os.path.join(probe_e2e["ref_dir"], name)) as f:
            ref_pred = json.load(f)
        with open(os.path.join(probe_e2e["our_dir"], name)) as f:
            our_pred = json.load(f)
        assert our_pred == ref_pred, name


def test_probe_projection_actually_trains(probe_e2e):
    """The probe proj must MOVE (it is inside the optimizer on both sides)
    and end equal on both sides."""
    ref_proj = _t(probe_e2e["ref"].model.oneWordpsdProbe.oneWordpsdProbe.proj)
    from mtvaf_tpu.train.steps import export_params
    our_proj = np.asarray(export_params(probe_e2e["ours"].state)["probe"]["proj"])
    np.testing.assert_allclose(our_proj, ref_proj, rtol=5e-3, atol=1e-6)
