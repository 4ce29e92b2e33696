"""MULTIMODAL full-trainer e2e oracle: the reference's own
``SATrainer2.train()`` with ``use_prefix`` — ``multiModal_before_train``
param groups (modules/train.py:894-926), ``get_visual_prompt`` prefix KVs +
VAO ANP KL losses (models/bert_model.py:534-588) — run to completion against
``CrfTrainer`` with ``--groups_mode reference``.

Extends the text-only oracle (test_reference_trainer_e2e.py) to the visual
pipeline.  The prefix machinery hardcodes BERT-base width (12 projectors,
``reshape(bsz, 12, -1, 64)`` — models/bert_model.py:455,587), so this runs a
full-width 12-layer encoder on tiny data.

Guides are SHARED: real JPEGs go through OUR image pipeline + frozen JAX
ResNet-18 (``compute_visual_guides`` — the exact arrays the production
GuideCache feeds the trainer), and the reference's ImageModel is stubbed to
unpack those same packed guides back into its 4 stage tensors (the inverse
of its ``torch.cat(stages,1).view(bsz,4,-1)`` packing).  Both trainers
therefore consume bit-identical guides, so any trajectory drift isolates the
trainer/model/optimizer semantics under test; our image→guide numerics are
pinned separately (test_resnet stage parity, test_prefix).

Pinned per epoch, like the text-only oracle: train F1 (via the reference's
string-sliced seqeval-report parse), mean train loss, dev F1/loss, test F1,
best-dev selection, final best-model-reload test, and the
``dev_predictions.json`` artifact.  Both sides run deterministically (torch
dropout p=0 everywhere; ``Config.deterministic``).
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
nn = torch.nn

from reference_stubs import (import_reference_models,
                             import_reference_trainer, reference_available)
from test_resnet import BasicBlock, TorchResNet, randomize_bn

from mtvaf_tpu.core.config import CRF_LABEL_LIST, Config
from mtvaf_tpu.core.convert import (bert_params_from_torch,
                                    resnet_params_from_torch)
from mtvaf_tpu.data.datasets import CrfDataset, iterate_batches
from mtvaf_tpu.data.synthetic import (make_crf_files, make_images,
                                      make_vocab_file)
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.resnet import BLOCK_COUNTS
from mtvaf_tpu.train.trainer_crf import CrfTrainer

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not present")

N_TRAIN, N_EVAL, BATCH, EPOCHS = 8, 4, 4, 3
N_ANP = 8
LR, WARMUP = 1e-3, 0.25


class _Recorder:
    def __init__(self):
        self.scalars = defaultdict(list)

    def add_scalar(self, tag=None, scalar_value=None, global_step=None, **kw):
        self.scalars[tag].append(float(scalar_value))


class _StubImageModel(nn.Module):
    """Replays OUR packed ResNet-18 guides as the reference's 4 stage
    tensors — the exact inverse of ``get_resnet_prompt``'s packing for the
    use_18 channel layout (64+128+256+512=960, 2x2 pooled)."""

    channels = (64, 128, 256, 512)

    def __init__(self):
        super().__init__()
        self.current = None   # (main (B,4,960), aux (B,3,4,960)) per batch

    def forward(self, images, aux_imgs=None):
        main_g, aux_g = self.current

        def unpack(g):
            x = torch.tensor(np.asarray(g)).reshape(
                g.shape[0], -1).reshape(g.shape[0], 960, 2, 2)
            return list(torch.split(x, list(self.channels), dim=1))

        return unpack(main_g), [unpack(aux_g[:, i]) for i in range(3)]


class _RefLoader:
    """Our batch stream as the reference ``use_prefix`` 8-tuple
    (modules/train.py:866) — and the per-batch guide feed for the stub."""

    def __init__(self, arrays, batch_size, shuffle, seed, guides, stub):
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.guides = guides        # row index -> (main (4,960), aux (3,4,960))
        self.stub = stub
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
            rows = b["example_index"]
            self.stub.current = (
                np.stack([self.guides[r][0] for r in rows]),
                np.stack([self.guides[r][1] for r in rows]))
            yield (torch.tensor(b["input_ids"], dtype=torch.long),
                   torch.tensor(b["input_mask"], dtype=torch.long),
                   torch.tensor(b["segment_ids"], dtype=torch.long),
                   torch.tensor(b["label_ids"], dtype=torch.long),
                   torch.tensor(b["auxlabel_ids"], dtype=torch.long),
                   torch.tensor(b["imagelabel"]),
                   torch.zeros(len(rows), 3, 224, 224),
                   torch.zeros(len(rows), 3, 3, 224, 224))


def _ref_args(save_path):
    import types
    return types.SimpleNamespace(
        prefix_dim=800, prefix_len=4, bert_name="bert-base-uncased",
        use_prefix=True, use_152=False, use_101=False, use_34=False,
        use_18=True, resnet_root="unused", gcn_layer_number=0, num_layers=0,
        use_probe=False, n_gpu=1, device="cpu", vao=True, noauxloss=False,
        alpha=0.25, beta=0.5, num_epochs=EPOCHS, eval_begin_epoch=1,
        gradient_accumulation_steps=1, train_batch_size=BATCH,
        eval_batch_size=BATCH, lr=LR, warmup_ratio=WARMUP, load_path=None,
        use_pretrained=False, local_rank=-1, save_path=save_path)


def _c(t):
    """Owned copy (torch .numpy() views live storage the reference's
    optimizer mutates in place)."""
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def _dense(m):
    return {"kernel": _c(m.weight).T, "bias": _c(m.bias)}


@pytest.fixture(scope="module")
def mm_e2e(tmp_path_factory):
    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp("trainer_e2e_mm")

    # ---- synthetic data WITH images ----
    vocab = os.path.join(d, "vocab.txt")
    make_vocab_file(vocab)
    tok = FullTokenizer(vocab)

    img_ids = [f"{800000 + i}.jpg" for i in range(4)]
    img_dir = os.path.join(d, "imgs")
    aux_dir = os.path.join(d, "aux")
    make_images(img_dir, img_ids, size=96)
    aux_names = [f"crop_{i}.jpg" for i in range(3)]
    make_images(aux_dir, aux_names, size=96)
    # uneven crop counts exercise the <=3 zero-padding on both sides
    aux_map = {img_ids[0]: aux_names, img_ids[1]: aux_names[:2],
               img_ids[2]: aux_names[:1]}

    files = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        tsv = os.path.join(d, f"{split}.txt")
        anp = os.path.join(d, f"{split}_anp.json")
        make_crf_files(tsv, anp, n, seed=seed, num_anp=N_ANP,
                       image_ids=img_ids)
        files[split] = (tsv, anp)

    cfg = Config(dataset_name="twitter2015", max_seq=32,
                 use_prefix=True, use_18=True, vao=True, prefix_len=4,
                 num_anp_classes=N_ANP, groups_mode="reference",
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 optimizer_mu_bf16=False, alpha=0.25,
                 cache_dir=os.path.join(d, "cache"),
                 save_path=os.path.join(d, "ours"))
    datasets = {s: CrfDataset.load(cfg, tok, tsv, anp, img_dir=img_dir,
                                   aux_dir=aux_dir, aux_map=aux_map)
                for s, (tsv, anp) in files.items()}

    # ---- shared frozen ResNet-18: hand-rolled torch module (torchvision
    # naming) -> converted params; OUR pipeline computes the guides ----
    torch.manual_seed(11)
    torch_resnet = TorchResNet(BasicBlock, list(BLOCK_COUNTS[18]))
    randomize_bn(torch_resnet, seed=11)
    torch_resnet.eval()
    resnet_params = resnet_params_from_torch(torch_resnet.state_dict(),
                                             BLOCK_COUNTS[18])

    # Guides computed ONCE through the trainer's own GuideCache class and
    # spilled to ITS disk cache: the production trainer below re-reads the
    # exact same bytes (GuideCache._get consults disk on miss), so the stub
    # and the trainer share bit-identical guides — no dependence on conv
    # batch-composition numerics.
    from mtvaf_tpu.train.ingest import GuideCache
    guide_dir = os.path.join(cfg.cache_dir, "guides")
    store = datasets["train"].image_store
    assert store is not None
    with jax.default_matmul_precision("highest"):
        seed_gc = GuideCache(resnet_params, 18, cache_dir=guide_dir)
        mg, ag = seed_gc._host_batch(img_ids, store)
    for key, val in seed_gc._cache.items():
        p = seed_gc._disk_path(key)
        if p and not os.path.exists(p):
            np.savez(p, main=val[0], aux=val[1])
    by_id = {i: (mg[k], ag[k]) for k, i in enumerate(img_ids)}
    guides = {}   # (split, row) -> (main (4,960), aux (3,4,960)) fp32
    for split, ds in datasets.items():
        for r in range(len(ds)):
            guides[(split, r)] = by_id[ds.image_ids[r]]

    # ---- reference model: its own TVNetSAModel2 + stubbed ImageModel ----
    bert_cfg = BertConfig.base()
    import dataclasses
    bert_cfg = dataclasses.replace(bert_cfg, vocab_size=len(tok.vocab))
    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")

    stub = _StubImageModel()
    mp = pytest.MonkeyPatch()
    mp.setattr(ref.BertModel, "from_pretrained",
               classmethod(lambda cls, name, *a, **k: cls(hf_cfg)))
    mp.setattr(ref, "ImageModel", lambda *a, **k: stub)
    try:
        torch.manual_seed(3)
        args = _ref_args(os.path.join(d, "ref"))
        model = ref.TVNetSAModel2(list(CRF_LABEL_LIST), tokenizer=None,
                                  args=args)
    finally:
        mp.undo()
    # shrink the 2089-way ANP heads to N_ANP (weights converted below, so
    # both sides share whatever init this produces)
    torch.manual_seed(4)
    model.img_classifier = nn.Linear(6144, N_ANP)
    model.aux_img_classifier = nn.ModuleList(
        [nn.Linear(6144, N_ANP) for _ in range(3)])
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(), 12),
        "fc": _dense(model.fc),
        "crf": {
            "start": _c(model.crf.start_transitions),
            "end": _c(model.crf.end_transitions),
            "transitions": _c(model.crf.transitions),
        },
        "prefix": {
            "conv_in": _dense(model.encoder_conv[0]),
            "conv_out": _dense(model.encoder_conv[2]),
            "projectors": {
                "kernel": jnp.stack([_c(p.weight).T
                                     for p in model.projectors]),
                "bias": jnp.stack([_c(p.bias) for p in model.projectors]),
            },
            "img_classifier": _dense(model.img_classifier),
            "aux_img_classifiers": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[_dense(m) for m in model.aux_img_classifier]),
        },
    }

    import logging
    import types as _types
    label_map = {label: i for i, label in enumerate(CRF_LABEL_LIST, 1)}
    ref_writer = _Recorder()

    def loader(split, shuffle):
        ds = datasets[split]
        return _RefLoader(ds.arrays, BATCH, shuffle, cfg.seed,
                          {r: guides[(split, r)] for r in range(len(ds))},
                          stub)

    ref_trainer = rt.SATrainer2(
        train_data=loader("train", True), dev_data=loader("dev", False),
        test_data=loader("test", False), model=model, label_map=label_map,
        args=args, logger=logging.getLogger("ref_e2e_mm"), writer=ref_writer,
        dev_dataset=_types.SimpleNamespace(
            examples=datasets["dev"].examples,
            features=datasets["dev"].features),
        test_dataset=_types.SimpleNamespace(
            examples=datasets["test"].examples,
            features=datasets["test"].features))
    ref_trainer.train()

    # ---- our production trainer: images -> GuideCache -> fused steps ----
    # host snapshot of the initial params (the fused step DONATES the live
    # param buffers, so the jnp arrays in `params` are dead after training)
    params0 = jax.tree.map(np.asarray, params)
    our_writer = _Recorder()
    with jax.default_matmul_precision("highest"):
        trainer = CrfTrainer(cfg, bert_cfg, params,
                             train_dataset=datasets["train"],
                             dev_dataset=datasets["dev"],
                             test_dataset=datasets["test"],
                             resnet_params=resnet_params, writer=our_writer)
        assert trainer.guide_cache is not None
        trainer.train()
        final_test_f1 = trainer.test(EPOCHS, load_best_model=True)

    print("ref trajectories:",
          {k: [round(v, 4) for v in ref_writer.scalars[k]]
           for k in ("train_f1", "dev_f1", "test_f1", "dev_loss")})
    return {"ref": ref_trainer, "ref_writer": ref_writer, "ours": trainer,
            "our_writer": our_writer, "final_test_f1": final_test_f1,
            "ref_dir": args.save_path, "our_dir": cfg.save_path,
            "params0": params0}


def _round4(xs):
    return [round(float(x), 4) for x in xs]


def test_mm_train_f1_trajectory(mm_e2e):
    ref_f1 = mm_e2e["ref_writer"].scalars["train_f1"]
    our_f1 = mm_e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)


def test_mm_train_loss_trajectory(mm_e2e):
    ref_losses = mm_e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    our_epoch = mm_e2e["our_writer"].scalars["train_loss"]
    # rtol 1e-3 (the text-only oracle pins 2e-4): the reference's own
    # multimodal group puts crf/fc at lr 5e-2 (modules/train.py:911-916),
    # which over 6 tiny-data steps is deliberately hot — the loss GROWS
    # ~10x on BOTH sides and chaotically amplifies fp32 torch-vs-XLA eps
    # (measured fixed offset: 3.8e-4 by epoch 3, exact at epoch 1).  Both
    # runs are deterministic, so this is a constant, not flake; a wrong
    # lr/group/schedule diverges by orders of magnitude more.
    np.testing.assert_allclose(our_epoch, ref_epoch, rtol=1e-3)
    np.testing.assert_allclose(our_epoch[0], ref_epoch[0], rtol=2e-5)
    assert max(ref_epoch) > 1.5 * min(ref_epoch)   # nontrivial dynamics


def test_mm_dev_trajectory_and_best_selection(mm_e2e):
    ref_dev = mm_e2e["ref_writer"].scalars["dev_f1"]
    our_dev = mm_e2e["our_writer"].scalars["dev_f1"]
    assert len(ref_dev) == len(our_dev) == EPOCHS
    assert _round4(ref_dev) == _round4(our_dev)
    np.testing.assert_allclose(mm_e2e["our_writer"].scalars["dev_loss"],
                               mm_e2e["ref_writer"].scalars["dev_loss"],
                               rtol=1e-3)   # see test_mm_train_loss_trajectory
    assert mm_e2e["ours"].best_dev_epoch == mm_e2e["ref"].best_dev_epoch
    assert round(mm_e2e["ours"].best_dev_metric, 4) == round(
        mm_e2e["ref"].best_dev_metric, 4)


def test_mm_test_trajectory_and_best_reload(mm_e2e):
    ref_test = mm_e2e["ref_writer"].scalars["test_f1"]
    our_test = mm_e2e["our_writer"].scalars["test_f1"]
    assert len(ref_test) == EPOCHS
    assert _round4(ref_test[:-1]) == _round4(our_test[:EPOCHS - 1])
    assert round(float(ref_test[-1]), 4) == round(mm_e2e["final_test_f1"], 4)


def test_mm_dev_predictions_artifact(mm_e2e):
    with open(os.path.join(mm_e2e["ref_dir"], "dev_predictions.json")) as f:
        ref_pred = json.load(f)
    with open(os.path.join(mm_e2e["our_dir"], "dev_predictions.json")) as f:
        our_pred = json.load(f)
    assert our_pred == ref_pred


def test_mm_reference_grouping_froze_projectors(mm_e2e):
    """multiModal_before_train's group collection never matches 'projectors'
    or the ANP heads (modules/train.py:894-926) — with --groups_mode
    reference ours must leave them at their initial values too, and they
    must ALSO be untouched on the reference side (its optimizer simply
    doesn't contain them)."""
    got = mm_e2e["ours"].state.params["prefix"]
    np.testing.assert_array_equal(
        np.asarray(got["projectors"]["kernel"]),
        np.asarray(mm_e2e["params0"]["prefix"]["projectors"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(got["img_classifier"]["kernel"]),
        np.asarray(mm_e2e["params0"]["prefix"]["img_classifier"]["kernel"]))
    ref_model = mm_e2e["ref"].model
    np.testing.assert_array_equal(
        np.asarray(ref_model.projectors[0].weight.detach().numpy()).T,
        np.asarray(mm_e2e["params0"]["prefix"]["projectors"]["kernel"][0]))


# ===========================================================================
# Pipeline A MULTIMODAL: the reference's own SATrainer.train() with
# use_prefix — get_visual_prompt computed TWICE per step (modules/train.py:341
# via _step and models/bert_model.py:256 inside the second forward), the
# extraction → host span harvest → full forward loop, and
# multiModal_before_train's groups (which leave EVERY pipeline-A task head
# out of the optimizer, modules/train.py:468-493) — run to completion vs
# SpanTrainer --groups_mode reference.  Model A's encoder_conv is always
# 3840-wide (models/bert_model.py:224-228), so the shared frozen backbone is
# a converted ResNet-50 (the reference's no-variant-flag default).  Guides
# are shared bit-identically through the production GuideCache's disk spill,
# exactly as in the CRF fixture above.


class _RefSpanMMLoader(_RefLoader):
    """Our span batch stream as the reference's use_prefix 10-tuple
    (modules/train.py:338-340), with the per-batch guide feed."""

    KEYS = ("input_ids", "input_mask", "segment_ids", "example_index",
            "start_positions", "end_positions", "bio_labels",
            "polarity_positions")

    def __iter__(self):
        if self.shuffle:
            self.epoch += 1
        for b in iterate_batches(self.arrays, self.batch_size,
                                 shuffle=self.shuffle, seed=self.seed,
                                 epoch=self.epoch):
            rows = b["example_index"]
            self.stub.current = (
                np.stack([self.guides[r][0] for r in rows]),
                np.stack([self.guides[r][1] for r in rows]))
            yield tuple(torch.tensor(b[k], dtype=torch.long)
                        for k in self.KEYS) + (
                torch.zeros(len(rows), 3, 224, 224),
                torch.zeros(len(rows), 3, 3, 224, 224))


class _StubImageModel50(_StubImageModel):
    channels = (256, 512, 1024, 2048)

    def forward(self, images, aux_imgs=None):
        main_g, aux_g = self.current

        def unpack(g):
            x = torch.tensor(np.asarray(g)).reshape(
                g.shape[0], -1).reshape(g.shape[0], 3840, 2, 2)
            return list(torch.split(x, list(self.channels), dim=1))

        return unpack(main_g), [unpack(aux_g[:, i]) for i in range(3)]


def _ref_span_args(cfg, save_path):
    import types
    return types.SimpleNamespace(
        prefix_dim=800, prefix_len=4, bert_name="bert-base-uncased",
        use_prefix=True, use_152=False, use_101=False, use_34=False,
        use_18=False, resnet_root="unused", gcn_layer_number=0, num_layers=0,
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
def span_mm_e2e(tmp_path_factory):
    from test_resnet import Bottleneck

    from mtvaf_tpu.data.datasets import SpanDataset
    from mtvaf_tpu.data.synthetic import make_span_file
    from mtvaf_tpu.train.ingest import GuideCache
    from mtvaf_tpu.train.trainer_span import SpanTrainer

    ref = import_reference_models()
    rt = import_reference_trainer()
    d = tmp_path_factory.mktemp("span_trainer_e2e_mm")

    vocab = os.path.join(d, "vocab.txt")
    make_vocab_file(vocab)
    tok = FullTokenizer(vocab)

    img_ids = [f"{810000 + i}.jpg" for i in range(4)]
    img_dir = os.path.join(d, "imgs")
    aux_dir = os.path.join(d, "aux")
    make_images(img_dir, img_ids, size=96)
    aux_names = [f"crop_{i}.jpg" for i in range(3)]
    make_images(aux_dir, aux_names, size=96)
    aux_map = {img_ids[0]: aux_names, img_ids[1]: aux_names[:2]}

    cfg = Config(dataset_name="twitter15", max_seq=32, use_prefix=True,
                 prefix_len=4, groups_mode="reference",
                 train_batch_size=BATCH, eval_batch_size=BATCH,
                 num_epochs=EPOCHS, eval_begin_epoch=1, lr=LR,
                 warmup_ratio=WARMUP, bf16=False, deterministic=True,
                 optimizer_mu_bf16=False, max_answer_length=4,
                 cache_dir=os.path.join(d, "cache"),
                 save_path=os.path.join(d, "ours"))
    assert cfg.resnet_depth == 50    # the reference's no-variant default

    datasets = {}
    for split, (n, seed) in {"train": (N_TRAIN, 0), "dev": (N_EVAL, 1),
                             "test": (N_EVAL, 2)}.items():
        f = os.path.join(d, f"{split}.txt")
        make_span_file(f, n, seed=seed, max_len=14, image_ids=img_ids)
        datasets[split] = SpanDataset.load(cfg, tok, f, mode=split,
                                           img_dir=img_dir, aux_dir=aux_dir,
                                           aux_map=aux_map)

    torch.manual_seed(13)
    torch_resnet = TorchResNet(Bottleneck, list(BLOCK_COUNTS[50]))
    randomize_bn(torch_resnet, seed=13)
    torch_resnet.eval()
    resnet_params = resnet_params_from_torch(torch_resnet.state_dict(),
                                             BLOCK_COUNTS[50])

    guide_dir = os.path.join(cfg.cache_dir, "guides")
    store = datasets["train"].image_store
    assert store is not None
    with jax.default_matmul_precision("highest"):
        seed_gc = GuideCache(resnet_params, 50, cache_dir=guide_dir)
        mg, ag = seed_gc._host_batch(img_ids, store)
    for key, val in seed_gc._cache.items():
        p = seed_gc._disk_path(key)
        if p and not os.path.exists(p):
            np.savez(p, main=val[0], aux=val[1])
    by_id = {i: (mg[k], ag[k]) for k, i in enumerate(img_ids)}

    bert_cfg = BertConfig.base()
    import dataclasses
    bert_cfg = dataclasses.replace(bert_cfg, vocab_size=len(tok.vocab))
    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")

    stub = _StubImageModel50()
    mp = pytest.MonkeyPatch()
    mp.setattr(ref.BertModel, "from_pretrained",
               classmethod(lambda cls, name, *a, **k: cls(hf_cfg)))
    mp.setattr(ref, "ImageModel", lambda *a, **k: stub)
    try:
        torch.manual_seed(17)
        args = _ref_span_args(cfg, os.path.join(d, "ref"))
        model = ref.TVNetSAModel(list(range(4)), tokenizer=None, args=args)
    finally:
        mp.undo()
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0

    params = {
        "bert": bert_params_from_torch(model.bert.state_dict(), 12),
        "dense": _dense(model.dense),
        "unary_affine": _dense(model.unary_affine),
        "binary_affine": _dense(model.binary_affine),
        "classifier": _dense(model.classifier),
        "prefix": {
            "conv_in": _dense(model.encoder_conv[0]),
            "conv_out": _dense(model.encoder_conv[2]),
            "projectors": {
                "kernel": jnp.stack([_c(p.weight).T
                                     for p in model.projectors]),
                "bias": jnp.stack([_c(p.bias) for p in model.projectors]),
            },
        },
    }

    import logging
    import types as _types
    os.makedirs(args.save_path, exist_ok=True)
    ref_writer = _Recorder()
    mk = lambda ds: _types.SimpleNamespace(
        examples=ds.examples, features=ds.features, img_path=None,
        data_dict=None, tokenizer=None, max_seq=cfg.max_seq)

    def loader(split, shuffle):
        ds = datasets[split]
        gm = {r: by_id[ds.image_ids[r]] for r in range(len(ds))}
        return _RefSpanMMLoader(ds.arrays, BATCH, shuffle, cfg.seed, gm, stub)

    ref_trainer = rt.SATrainer(
        train_data=loader("train", True), dev_data=loader("dev", False),
        test_data=loader("test", False), model=model, label_map=None,
        args=args, logger=logging.getLogger("ref_span_e2e_mm"),
        writer=ref_writer, train_dataset=mk(datasets["train"]),
        dev_dataset=mk(datasets["dev"]), test_dataset=mk(datasets["test"]))
    ref_trainer.train()
    ref_test_f1 = ref_trainer.test()

    params0 = jax.tree.map(np.asarray, params)
    our_writer = _Recorder()
    with jax.default_matmul_precision("highest"):
        trainer = SpanTrainer(cfg, bert_cfg, params,
                              train_dataset=datasets["train"],
                              dev_dataset=datasets["dev"],
                              test_dataset=datasets["test"],
                              resnet_params=resnet_params, writer=our_writer)
        assert trainer.guide_cache is not None
        trainer.train()
        final_test_f1 = trainer.test(load_best_model=True)

    return {"ref": ref_trainer, "ref_writer": ref_writer, "ours": trainer,
            "our_writer": our_writer, "ref_test_f1": ref_test_f1,
            "final_test_f1": final_test_f1, "ref_dir": args.save_path,
            "our_dir": cfg.save_path, "params0": params0}


def test_span_mm_train_f1_trajectory(span_mm_e2e):
    ref_f1 = span_mm_e2e["ref_writer"].scalars["train_f1"]
    our_f1 = span_mm_e2e["our_writer"].scalars["train_f1"]
    assert len(ref_f1) == len(our_f1) == EPOCHS
    assert _round4(ref_f1) == _round4(our_f1)


def test_span_mm_train_loss_trajectory(span_mm_e2e):
    ref_losses = span_mm_e2e["ref_writer"].scalars["train_loss"]
    per_epoch = N_TRAIN // BATCH // 2
    ref_epoch = [float(np.mean(ref_losses[i * per_epoch:(i + 1) * per_epoch]))
                 for i in range(EPOCHS)]
    our_epoch = span_mm_e2e["our_writer"].scalars["train_loss"]
    np.testing.assert_allclose(our_epoch, ref_epoch, rtol=2e-4)


def test_span_mm_dev_trajectory_and_best_selection(span_mm_e2e):
    ref_dev = span_mm_e2e["ref_writer"].scalars["dev_f1"]
    our_dev = span_mm_e2e["our_writer"].scalars["dev_f1"]
    assert len(ref_dev) == len(our_dev) == EPOCHS
    assert _round4(ref_dev) == _round4(our_dev)
    assert (span_mm_e2e["ours"].best_dev_epoch
            == span_mm_e2e["ref"].best_dev_epoch)
    assert round(span_mm_e2e["ours"].best_dev_metric, 4) == round(
        span_mm_e2e["ref"].best_dev_metric, 4)


def test_span_mm_test_with_best_reload(span_mm_e2e):
    assert round(float(span_mm_e2e["ref_test_f1"]), 4) == round(
        span_mm_e2e["final_test_f1"], 4)


def test_span_mm_prediction_artifacts(span_mm_e2e):
    for name in ("train_predictions.json", "dev_predictions.json",
                 "test_predictions.json"):
        with open(os.path.join(span_mm_e2e["ref_dir"], name)) as f:
            ref_pred = json.load(f)
        with open(os.path.join(span_mm_e2e["our_dir"], name)) as f:
            our_pred = json.load(f)
        assert our_pred == ref_pred, name


def test_span_mm_reference_grouping_froze_heads(span_mm_e2e):
    """multiModal_before_train leaves every pipeline-A task head AND the
    projectors out of the optimizer (its groups only match bert /
    encoder_conv / gates / crf / fc — modules/train.py:468-493): both sides
    must end training with those weights bit-unchanged."""
    ours = span_mm_e2e["ours"].state.params
    p0 = span_mm_e2e["params0"]
    for key in ("dense", "unary_affine", "binary_affine", "classifier"):
        np.testing.assert_array_equal(np.asarray(ours[key]["kernel"]),
                                      np.asarray(p0[key]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(ours["prefix"]["projectors"]["kernel"]),
        np.asarray(p0["prefix"]["projectors"]["kernel"]))
    ref_model = span_mm_e2e["ref"].model
    np.testing.assert_array_equal(
        np.asarray(ref_model.dense.weight.detach().numpy()).T,
        np.asarray(p0["dense"]["kernel"]))
