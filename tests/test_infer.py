"""Inference API tests (raw text → predictions through jitted programs)."""

import jax
import numpy as np
import pytest

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.synthetic import make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.infer import CrfPredictor, SpanPredictor
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params, init_span_model_params


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    make_vocab_file(str(p))
    return FullTokenizer(str(p))


def test_crf_predictor(tokenizer):
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    pred = CrfPredictor(cfg, bert_cfg, params, tokenizer)
    out = pred.predict(["the pizza was great but service slow",
                        "bad battery"])
    assert len(out) == 2
    for sent_preds in out:
        for term, pol in sent_preds:
            assert isinstance(term, str)
            assert pol in ("POS", "NEG", "NEU")


def test_span_predictor(tokenizer):
    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    pred = SpanPredictor(cfg, bert_cfg, params, tokenizer)
    out = pred.predict(["great phone bad battery", "nice view"])
    assert len(out) == 2
    # with threshold -100 the random model must propose at least one span
    assert any(len(p) > 0 for p in out)
    for sent_preds in out:
        for term, pol in sent_preds:
            assert pol in ("other", "neutral", "positive", "negative",
                           "conflict")


def test_crf_predictor_with_images(tokenizer):
    """Prefix path: raw images → ResNet guides → prefix KVs → decode."""
    import numpy as np
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    pred = CrfPredictor(cfg, bert_cfg, params, tokenizer, resnet_params=resnet)
    rng = np.random.RandomState(0)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)
    aux = rng.randn(2, 3, 64, 64, 3).astype(np.float32)
    out = pred.predict(["great pizza", "slow service here"], images=images,
                       aux_images=aux)
    assert len(out) == 2


def test_crf_predict_many_matches_predict(tokenizer):
    """predict_many (pipelined, padded tail batch) == per-batch predict."""
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    pred = CrfPredictor(cfg, bert_cfg, params, tokenizer)
    sents = ["the pizza was great but service slow", "bad battery",
             "nice view from the room", "food cold", "great phone"]
    got = pred.predict_many(sents, batch_size=2, window=1)
    want = [pred.predict([s])[0] for s in sents]
    assert got == want


def test_span_predict_many_matches_predict(tokenizer):
    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    pred = SpanPredictor(cfg, bert_cfg, params, tokenizer)
    sents = ["great phone bad battery", "nice view", "food cold here",
             "the pizza was great", "slow service"]
    got = pred.predict_many(sents, batch_size=2, window=1)
    want = [pred.predict([s])[0] for s in sents]
    assert got == want


def test_crf_predict_many_with_images_matches_predict(tokenizer):
    """Bulk multimodal inference: predict_many slices/pads the image rows
    alongside the sentences; padded rows must stay (sentence, image)-
    consistent so results == per-sentence predict with that row's image."""
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    pred = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                        resnet_params=resnet)
    sents = ["the pizza was great but service slow", "bad battery",
             "nice view from the room", "food cold", "great phone"]
    rng = np.random.RandomState(0)
    images = rng.randn(5, 64, 64, 3).astype(np.float32)
    aux = rng.randn(5, 3, 64, 64, 3).astype(np.float32)
    got = pred.predict_many(sents, images=images, aux_images=aux,
                            batch_size=2, window=1)
    want = [pred.predict([s], images=images[j:j + 1],
                         aux_images=aux[j:j + 1])[0]
            for j, s in enumerate(sents)]
    assert got == want


def test_span_predict_many_with_images_matches_predict(tokenizer):
    """Same for the span pipeline: image rows enter the extraction stage as
    visual guides, chunk by chunk, through the packed dispatch."""
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    pred = SpanPredictor(cfg, bert_cfg, params, tokenizer,
                         resnet_params=resnet)
    sents = ["great phone bad battery", "nice view", "food cold here",
             "the pizza was great", "slow service"]
    rng = np.random.RandomState(0)
    images = rng.randn(5, 64, 64, 3).astype(np.float32)
    aux = rng.randn(5, 3, 64, 64, 3).astype(np.float32)
    got = pred.predict_many(sents, images=images, aux_images=aux,
                            batch_size=2, window=1)
    want = [pred.predict([s], images=images[j:j + 1],
                         aux_images=aux[j:j + 1])[0]
            for j, s in enumerate(sents)]
    assert got == want


def test_fp16_image_transfer_matches_fp32(tokenizer):
    """image_dtype=float16 halves the multimodal upload; the rows are cast
    back to fp32 on device, so predictions must match the fp32-transfer
    predictor on the same inputs (fp16 rounding of normalized pixels sits
    below the bf16 rounding the training guide table already applies)."""
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    p32 = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                       resnet_params=resnet)
    p16 = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                       resnet_params=resnet, image_dtype="float16")
    assert p16.to_device(jax.devices()[0]).image_dtype == np.float16
    sents = ["the pizza was great but service slow", "bad battery",
             "nice view from the room"]
    rng = np.random.RandomState(0)
    images = rng.randn(3, 64, 64, 3).astype(np.float32)
    aux = rng.randn(3, 3, 64, 64, 3).astype(np.float32)
    assert p16.predict(sents, images=images, aux_images=aux) == \
        p32.predict(sents, images=images, aux_images=aux)
    with pytest.raises(ValueError, match="image_dtype"):
        CrfPredictor(cfg, bert_cfg, params, tokenizer,
                     resnet_params=resnet, image_dtype="int8")


def test_uint8_image_transfer_matches_fp32(tokenizer):
    """image_dtype=uint8 quarters the multimodal upload: rows ship as raw
    pixels (data/images.denormalize_to_u8) and the ImageNet normalize
    re-runs inside the fused device program (nn.models.image_rows_to_f32).
    For uint8-origin pixels — i.e. anything the PIL preprocessing path
    produced — the round-trip is EXACT, so predictions match the fp32
    predictor; the noaux branch (program-created zero aux rows) must stay
    in normalized space."""
    from mtvaf_tpu.data.images import _normalize, denormalize_to_u8
    from mtvaf_tpu.nn.resnet import init_resnet_params

    # denormalize(normalize(p)) recovers EVERY uint8 value on EVERY channel
    every = np.broadcast_to(np.arange(256, dtype=np.uint8).reshape(16, 16, 1),
                            (16, 16, 3))
    np.testing.assert_array_equal(denormalize_to_u8(_normalize(every)), every)

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    p32 = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                       resnet_params=resnet)
    pu8 = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                       resnet_params=resnet, image_dtype="uint8")
    assert pu8.to_device(jax.devices()[0]).image_dtype == np.uint8
    sents = ["the pizza was great but service slow", "bad battery",
             "nice view from the room"]
    rng = np.random.RandomState(0)
    images = _normalize(rng.randint(0, 256, (3, 64, 64, 3)).astype(np.uint8))
    aux = _normalize(rng.randint(0, 256, (3, 3, 64, 64, 3)).astype(np.uint8))
    assert pu8.predict(sents, images=images, aux_images=aux) == \
        p32.predict(sents, images=images, aux_images=aux)
    # one image per request, no aux crops (the online serving shape)
    assert pu8.predict(sents, images=images) == \
        p32.predict(sents, images=images)
    # and through the pipelined bulk path
    assert pu8.predict_many(sents, images=images, aux_images=aux,
                            batch_size=2, window=1) == \
        p32.predict(sents, images=images, aux_images=aux)


def test_unpackable_fallback_undoes_transfer_dtype(tokenizer, monkeypatch):
    """When pack_host can't serialize the batch (exotic leaf), the per-leaf
    fallback must convert the TRANSFER-representation rows back to
    normalized fp32 before the unfused guide program — uint8 rows are raw
    de-normalized pixels at that point, not normalized floats."""
    from mtvaf_tpu.data.images import _normalize
    from mtvaf_tpu.nn.resnet import init_resnet_params
    from mtvaf_tpu.train import ingest

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    p32 = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                       resnet_params=resnet)
    pu8 = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                       resnet_params=resnet, image_dtype="uint8")
    sents = ["the pizza was great but service slow", "bad battery"]
    rng = np.random.RandomState(0)
    images = _normalize(rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8))
    aux = _normalize(rng.randint(0, 256, (2, 3, 64, 64, 3)).astype(np.uint8))
    want = p32.predict(sents, images=images, aux_images=aux)
    monkeypatch.setattr(ingest, "pack_host", lambda host: None)
    assert pu8.predict(sents, images=images, aux_images=aux) == want
    assert pu8.predict(sents, images=images) == \
        p32.predict(sents, images=images)


def test_misaligned_image_rows_fail_fast(tokenizer):
    """images/aux_images shorter (or longer) than the sentence list must
    raise a clear ValueError at call time, not surface chunks later as an
    XLA shape mismatch (0-row slice through _pad_rows) mid-stream."""
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    pred = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                        resnet_params=resnet)
    sents = ["a b", "c d", "e f"]
    short = np.zeros((2, 64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="images has 2 rows"):
        pred.predict_many(sents, images=short)
    with pytest.raises(ValueError, match="images has 2 rows"):
        pred.dispatch(sents, images=short)
    with pytest.raises(ValueError, match="aux_images has 2 rows"):
        pred.predict_many(sents, images=np.zeros((3, 64, 64, 3), np.float32),
                          aux_images=np.zeros((2, 3, 64, 64, 3), np.float32))

    scfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                  max_answer_length=4, logit_threshold=-100.0, bf16=False,
                  use_prefix=True, use_18=True, prefix_len=4)
    sparams = init_span_model_params(jax.random.PRNGKey(0), scfg, bert_cfg)
    spred = SpanPredictor(scfg, bert_cfg, sparams, tokenizer,
                          resnet_params=resnet)
    with pytest.raises(ValueError, match="images has 2 rows"):
        spred.predict_many(sents, images=short)
    with pytest.raises(ValueError, match="images has 2 rows"):
        spred.dispatch(sents, images=short)


def test_span_predictor_with_digcn(tokenizer):
    """A DiGCN-trained span model must serve: with side arrays the eval
    classification re-encodes through compression + DiGCN; without them
    (raw-text streaming) it skips the re-encode like the trainers when the
    GCN side file is absent."""
    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False,
                 gcn_layer_number=1)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    pred = SpanPredictor(cfg, bert_cfg, params, tokenizer)
    sents = ["great phone bad battery", "nice view"]

    out_plain = pred.predict(sents)              # no side data: skip DiGCN
    assert len(out_plain) == 2

    rng = np.random.RandomState(0)
    valid = np.ones((2, cfg.max_seq), np.int32)
    adj = (rng.rand(2, cfg.max_seq, cfg.max_seq) > 0.5).astype(np.float32)
    out_gcn = pred.predict(sents, gcn=(valid, adj))
    assert len(out_gcn) == 2

    # the re-encode must actually change the classification inputs:
    # polarity predictions may or may not differ, but the call path must
    # accept both shapes without retracing errors
    out_many = pred.predict_many(sents * 3, batch_size=2, window=1)
    assert len(out_many) == 6


def test_packed_dispatch_matches_per_leaf_placement(tokenizer):
    """The one-RPC packed dispatch (pack_host buffer + fused unpack) must be
    a transport change only: identical tags/results to running the decode on
    per-leaf jnp.asarray placement."""
    import jax.numpy as jnp

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    pred = CrfPredictor(cfg, bert_cfg, params, tokenizer)
    sents = ["the pizza was great but service slow", "bad battery",
             "nice view from the room"]

    got = pred.predict(sents)                       # packed path
    assert pred._packed_fns, "packed program was not used"

    host = pred._make_host_batch(sents)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    out = pred._decode(pred.params, batch)          # per-leaf path
    want = pred._to_results(sents, host["label_ids"], host["input_mask"],
                            np.asarray(out["pred_tags"]))
    assert got == want


def test_pack_host_round_trip():
    """pack_host + unpack_program reproduce every leaf bit-for-bit."""
    import jax.numpy as jnp

    from mtvaf_tpu.train.ingest import pack_host, unpack_program

    rng = np.random.RandomState(0)
    host = {
        "ids": rng.randint(0, 1000, (4, 7)).astype(np.int32),
        "mask": rng.randint(0, 2, (4, 7)).astype(np.int8),
        "f32": rng.randn(4, 3, 2).astype(np.float32),
        "b": (rng.rand(4) > 0.5),
    }
    packed = pack_host(host)
    assert packed is not None
    buf, segs = packed
    assert buf.dtype == np.uint8
    got = jax.jit(unpack_program(segs))(buf)
    assert set(got) == set(host)
    for k in host:
        assert got[k].dtype == np.asarray(host[k]).dtype
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(host[k]))

    # unpackable layouts signal None instead of corrupting: scalar leaves,
    # and ml_dtypes kinds like bfloat16 ('V' — np.dtype(str) would not
    # round-trip the raw bits, same rule as pack_and_put)
    assert pack_host({"x": np.float32(3.0)}) is None
    assert pack_host({"x": np.zeros((2, 2), jnp.bfloat16)}) is None
