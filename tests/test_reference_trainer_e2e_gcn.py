"""Full-trainer e2e oracle for the GCN variants (SURVEY.md C12).

The reference's OWN ``SATrainer.train()`` run to completion on CPU with each
GCN head engaged, against ``SpanTrainer`` on identical synthetic data +
side arrays, identical converted weights and identical schedule:

* **DiGCN** (``gcn_layer_number > 0``, models/bert_model.py:233-234,
  270-284): valid-ids compression + directional-attention GCN re-encodes
  the sequence before the span gather, in BOTH the train forward and the
  eval classification stage; the batch carries
  (valid_ids, b_use_valid_filter, adj_matrix, dep_matrix)
  (modules/train.py:348-350).
* **DualGCN** (``num_layers > 0``, models/bert_model.py:236-237, 307-309,
  348-349): GCNBert computes sentence-polarity logits + ortho/diff
  penalties from the extraction outputs; ``tat_loss + penal`` joins the
  span loss; the batch carries (adj_matrix, src_mask, aspect_mask,
  polaritys) (modules/train.py:352-355).

Forward parity for both heads is pinned separately
(test_reference_oracle.py); this file pins the TRAINING dynamics — every
GCN parameter inside the reference's plain-AdamW surface
(modules/train.py:461-462), per-epoch train/dev/test F1 and loss
trajectories, best-dev selection and the prediction JSONs.

Both sides run deterministically (torch dropouts at p=0, our
``Config.deterministic``).
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

N_TRAIN, N_EVAL, BATCH, EPOCHS = 16, 8, 4, 3
LR, WARMUP = 1e-3, 0.25


class _Recorder:
    def __init__(self):
        from collections import defaultdict
        self.scalars = defaultdict(list)

    def add_scalar(self, tag=None, scalar_value=None, global_step=None, **kw):
        self.scalars[tag].append(float(scalar_value))


def _make_gcn_json(path, dataset, seed):
    """One record per feature: dependency adjacency over the first-subtoken
    positions plus the DualGCN masks/label — random but shared verbatim by
    both trainers."""
    rng = np.random.RandomState(seed)
    records = []
    for ids in dataset.arrays["input_mask"]:
        L = max(int(ids.sum()), 2)
        adj = (rng.rand(L, L) > 0.5).astype(float)
        np.fill_diagonal(adj, 1.0)
        valid = (rng.rand(L) > 0.2).astype(int)
        valid[0] = 1
        a_start = int(rng.randint(0, L - 1))
        aspect = np.zeros(L, int)
        aspect[a_start:a_start + 2] = 1
        records.append({
            "adj_matrix": adj.tolist(),
            "valid_ids": valid.tolist(),
            "src_mask": [1] * L,
            "aspect_mask": aspect.tolist(),
            "polarity": int(rng.randint(0, 3)),
        })
    with open(path, "w") as f:
        json.dump(records, f)


class _RefGcnSpanLoader:
    """Feeds the reference SATrainer OUR batch stream as the 12-tuple its
    GCN branches unpack (modules/train.py:348-355), same (seed, epoch)
    shuffle walk as SpanTrainer."""

    BASE = ("input_ids", "input_mask", "segment_ids", "example_index",
            "start_positions", "end_positions", "bio_labels",
            "polarity_positions")

    def __init__(self, arrays, batch_size, shuffle, seed, variant):
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.variant = variant               # 'digcn' | 'dualgcn'
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
            base = tuple(torch.tensor(b[k], dtype=torch.long)
                         for k in self.BASE)
            bsz, s = b["input_ids"].shape
            if self.variant == "digcn":
                yield base + (
                    torch.tensor(b["valid_ids"], dtype=torch.long),
                    torch.ones(bsz, dtype=torch.long),      # unused flag
                    torch.tensor(b["adjacency_matrix"],
                                 dtype=torch.float32),
                    torch.zeros(bsz, s, s))                  # dep: unused
            else:
                yield base + (
                    torch.tensor(b["adj_matrix"], dtype=torch.float32),
                    torch.tensor(b["src_mask"], dtype=torch.float32),
                    torch.tensor(b["aspect_mask"], dtype=torch.float32),
                    torch.tensor(b["polaritys"], dtype=torch.long))


def _ref_args(cfg, save_path, *, gcn_layer_number=0, num_layers=0):
    import types
    return types.SimpleNamespace(
        prefix_dim=800, prefix_len=4, bert_name="bert-base-uncased",
        use_prefix=False, use_152=False, use_101=False, use_34=False,
        use_18=False, resnet_root=None, gcn_layer_number=gcn_layer_number,
        num_layers=num_layers, use_probe=False, n_gpu=1, device="cpu",
        vao=False, noauxloss=False, alpha=cfg.alpha, beta=cfg.beta,
        num_epochs=EPOCHS, eval_begin_epoch=1,
        gradient_accumulation_steps=1, train_batch_size=BATCH,
        eval_batch_size=BATCH, lr=LR, warmup_ratio=WARMUP, load_path=None,
        use_pretrained=False, local_rank=-1, save_path=save_path,
        do_aug=False, do_lower_case=cfg.do_lower_case,
        verbose_logging=cfg.verbose_logging, filter_type=cfg.filter_type,
        use_heuristics=cfg.use_heuristics, use_nms=cfg.use_nms,
        logit_threshold=cfg.logit_threshold, n_best_size=cfg.n_best_size,
        max_answer_length=cfg.max_answer_length,
        # GCNBert reads these (models/bert_model.py:790-800)
        bert_dropout=0.0, gcn_dropout=0.0)


def _t(x):
    return np.array(x.detach().numpy(), copy=True)


def _dense(lin):
    return {"kernel": jnp.asarray(_t(lin.weight)).T,
            "bias": jnp.asarray(_t(lin.bias))}


def _digcn_params(module):
    layers = []
    for gcn in module.GCNLayers:
        layers.append({
            "left": _dense(gcn.left_linear),
            "self": _dense(gcn.self_linear),
            "right": _dense(gcn.right_linear),
            "ln": {"scale": jnp.asarray(_t(gcn.output_layer_norm.weight)),
                   "bias": jnp.asarray(_t(gcn.output_layer_norm.bias))},
        })
    return {"layers": layers}


def _dualgcn_params(module):
    return {
        "layernorm": {"scale": jnp.asarray(_t(module.layernorm.a_2)),
                      "bias": jnp.asarray(_t(module.layernorm.b_2))},
        "attn_q": _dense(module.attn.linears[0]),
        "attn_k": _dense(module.attn.linears[1]),
        "affine1": jnp.asarray(_t(module.affine1)),
        "affine2": jnp.asarray(_t(module.affine2)),
        "classifier": _dense(module.dualgcn_classifier),
        "W": [_dense(m) for m in module.W],
        "weight_list": [_dense(m) for m in module.weight_list],
    }


def _gcn_e2e(tmp_path_factory, *, variant):
    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp(f"{variant}_trainer_e2e")

    vocab = os.path.join(d, "vocab.txt")
    make_vocab_file(vocab)
    tok = FullTokenizer(vocab)
    gcn_layer_number = 2 if variant == "digcn" else 0
    num_layers = 1 if variant == "dualgcn" else 0
    cfg = Config(dataset_name="twitter15", max_seq=32,
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 optimizer_mu_bf16=False, max_answer_length=4,
                 gcn_layer_number=gcn_layer_number, num_layers=num_layers,
                 save_path=os.path.join(d, "ours"))
    datasets = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        f = os.path.join(d, f"{split}.txt")
        make_span_file(f, n, seed=seed, max_len=14)
        base = SpanDataset.load(cfg, tok, f, mode=split)
        gcn_f = os.path.join(d, f"{split}_gcn.json")
        _make_gcn_json(gcn_f, base, seed=seed + 10)
        datasets[split] = SpanDataset.load(cfg, tok, f, mode=split,
                                           gcn_file=gcn_f)

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
        args = _ref_args(cfg, os.path.join(d, "ref"),
                         gcn_layer_number=gcn_layer_number,
                         num_layers=num_layers)
        model = ref.TVNetSAModel(list(range(4)), tokenizer=None, args=args,
                                 type_num=cfg.type_num)
    finally:
        mp.undo()
    for m in model.modules():             # deterministic: no dropout
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    if variant == "dualgcn":
        # Reference quirk: GCNBert's affine1/affine2 are bare
        # ``nn.Parameter(torch.Tensor(...))`` — UNINITIALIZED memory
        # (models/bert_model.py:817-818); give them a real init before
        # conversion (same workaround as the forward oracle).
        with torch.no_grad():
            model.gcn.affine1.uniform_(-0.1, 0.1)
            model.gcn.affine2.uniform_(-0.1, 0.1)

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(),
                                       bert_cfg.num_hidden_layers),
        "dense": _dense(model.dense),
        "unary_affine": _dense(model.unary_affine),
        "binary_affine": _dense(model.binary_affine),
        "classifier": _dense(model.classifier),
    }
    if variant == "digcn":
        # dep_embedding intentionally left out: the reference creates it
        # (models/bert_model.py:235) but never uses it, so torch never
        # gives it gradients; carrying it in our tree would let weight
        # decay walk it while torch's stays frozen.
        params["digcn"] = _digcn_params(model.gcn)
    else:
        params["dualgcn"] = _dualgcn_params(model.gcn)

    import logging
    import types as _types
    os.makedirs(args.save_path, exist_ok=True)
    ref_writer = _Recorder()
    mk = lambda ds: _types.SimpleNamespace(
        examples=ds.examples, features=ds.features, img_path=None,
        data_dict=None, tokenizer=None, max_seq=cfg.max_seq)
    mk_loader = lambda split, shuf: _RefGcnSpanLoader(
        datasets[split].arrays, BATCH, shuf, cfg.seed, variant)
    ref_trainer = rt.SATrainer(
        train_data=mk_loader("train", True), dev_data=mk_loader("dev", False),
        test_data=mk_loader("test", False), model=model, label_map=None,
        args=args, logger=logging.getLogger(f"ref_{variant}_e2e"),
        writer=ref_writer, train_dataset=mk(datasets["train"]),
        dev_dataset=mk(datasets["dev"]), test_dataset=mk(datasets["test"]))
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


@pytest.fixture(scope="module")
def digcn_e2e(tmp_path_factory):
    return _gcn_e2e(tmp_path_factory, variant="digcn")


@pytest.fixture(scope="module")
def dualgcn_e2e(tmp_path_factory):
    return _gcn_e2e(tmp_path_factory, variant="dualgcn")


def _round4(xs):
    return [round(float(x), 4) for x in xs]


def _check_trajectories(e2e):
    ref_f1 = e2e["ref_writer"].scalars["train_f1"]
    our_f1 = e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)

    ref_losses = e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2     # refresh_step=2 values per epoch
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    our_epoch = e2e["our_writer"].scalars["train_loss"]
    np.testing.assert_allclose(our_epoch, ref_epoch, rtol=2e-4)
    assert ref_epoch[-1] < ref_epoch[0]   # training must actually move

    ref_dev = e2e["ref_writer"].scalars["dev_f1"]
    our_dev = e2e["our_writer"].scalars["dev_f1"]
    assert _round4(ref_dev) == _round4(our_dev)
    assert e2e["ours"].best_dev_epoch == e2e["ref"].best_dev_epoch
    assert round(float(e2e["ref_test_f1"]), 4) == round(
        e2e["final_test_f1"], 4)


def _check_artifacts(e2e):
    for name in ("train_predictions.json", "dev_predictions.json",
                 "test_predictions.json"):
        with open(os.path.join(e2e["ref_dir"], name)) as f:
            ref_pred = json.load(f)
        with open(os.path.join(e2e["our_dir"], name)) as f:
            our_pred = json.load(f)
        assert our_pred == ref_pred, name


def test_digcn_full_loop_trajectories(digcn_e2e):
    _check_trajectories(digcn_e2e)


def test_digcn_prediction_artifacts(digcn_e2e):
    _check_artifacts(digcn_e2e)


def test_dualgcn_full_loop_trajectories(dualgcn_e2e):
    _check_trajectories(dualgcn_e2e)


def test_dualgcn_prediction_artifacts(dualgcn_e2e):
    _check_artifacts(dualgcn_e2e)
