"""Serving-bundle export tests: frozen StableHLO programs == live predictor.

jax.export round trip for both pipelines (+ the multimodal CRF variant):
the deserialized artifact must reproduce the live predictor's predictions
exactly — same host code, byte-frozen device programs, weights baked in.
"""

import json
import os

import jax
import numpy as np
import pytest

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.synthetic import make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.export import export_predictor, load_exported_predictor
from mtvaf_tpu.infer import CrfPredictor, SpanPredictor
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params, init_span_model_params

SENTS = ["the pizza was great but service slow", "bad battery",
         "nice view from the room"]


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    make_vocab_file(str(p))
    return FullTokenizer(str(p))


@pytest.fixture(scope="module")
def crf_predictor(tokenizer):
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    return CrfPredictor(cfg, bert_cfg, params, tokenizer)


def test_crf_bundle_roundtrip(crf_predictor, tokenizer, tmp_path):
    out = str(tmp_path / "bundle")
    manifest = export_predictor(crf_predictor, out, batch_sizes=(1, 4),
                                platforms=("cpu",), bake_weights=True)
    assert manifest["pipeline"] == "crf" and manifest["rungs"] == [1, 4]
    assert manifest["bake_weights"] is True
    for prog in manifest["programs"]:
        assert os.path.getsize(os.path.join(out, prog["file"])) \
            == prog["bytes"] > 0
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["jax_version"] == jax.__version__

    served = load_exported_predictor(out, tokenizer)
    assert served.predict(SENTS) == crf_predictor.predict(
        SENTS + [SENTS[-1]])[:3]                      # live pads to rung 4
    # the single-sentence path rides the b1 program
    assert served.predict(SENTS[:1]) == crf_predictor.predict(SENTS[:1])


def test_crf_bundle_oversized_batch_raises(crf_predictor, tokenizer,
                                           tmp_path):
    out = str(tmp_path / "bundle")
    export_predictor(crf_predictor, out, batch_sizes=(2,), platforms=("cpu",))
    served = load_exported_predictor(out, tokenizer)
    with pytest.raises(ValueError, match="largest exported rung"):
        served.predict(SENTS)
    # predict_many splits the stream into rung-sized chunks instead
    got = served.predict_many(SENTS, batch_size=2)
    assert got == crf_predictor.predict_many(SENTS, batch_size=2)


def test_span_bundle_roundtrip(tokenizer, tmp_path):
    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    live = SpanPredictor(cfg, bert_cfg, params, tokenizer)

    out = str(tmp_path / "bundle")
    manifest = export_predictor(live, out, batch_sizes=(4,),
                                platforms=("cpu",), bake_weights=True)
    assert manifest["pipeline"] == "span"
    served = load_exported_predictor(out, tokenizer)
    # sentences the random tiny model proposes spans for (as in test_infer)
    sents = ["great phone bad battery", "nice view", SENTS[0]]
    want = live.predict(sents + [sents[-1]])[:3]
    assert served.predict(sents) == want
    assert any(len(p) > 0 for p in want)              # non-vacuous
    with pytest.raises(ValueError, match="without the multimodal"):
        served.predict(sents[:1], images=np.zeros((1, 224, 224, 3),
                                                  np.float32))


def test_multimodal_span_bundle_roundtrip(tokenizer, tmp_path):
    """Prefix span runs: the fused extract-with-images program (ResNet
    guides computed inside — one device call) reproduces the live image
    path (symmetric to the CRF bundle); text-only requests ride the plain
    extract program."""
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    live = SpanPredictor(cfg, bert_cfg, params, tokenizer,
                         resnet_params=resnet)

    out = str(tmp_path / "bundle")
    manifest = export_predictor(live, out, batch_sizes=(2,),
                                platforms=("cpu",))
    assert manifest["multimodal"]
    names = {p["name"] for p in manifest["programs"]}
    assert names == {"span_extract_b2", "span_extract_images_b2",
                     "span_extract_images_noaux_b2", "span_classify_b2"}

    served = load_exported_predictor(out, tokenizer)
    assert served.serves_images and served.export_rungs == (2,)
    sents = ["great phone bad battery", "nice view from the room"]
    rng = np.random.RandomState(0)
    images = rng.rand(2, 224, 224, 3).astype(np.float32)
    assert served.predict(sents, images=images) \
        == live.predict(sents, images=images)
    assert served.predict(sents) == live.predict(sents)
    # partial batch + explicit aux crops both pad up to the frozen rung
    aux = rng.rand(1, 3, 224, 224, 3).astype(np.float32)
    assert served.predict(sents[:1], images=images[:1], aux_images=aux) \
        == live.predict(sents[:1], images=images[:1], aux_images=aux)


def test_multimodal_crf_bundle_roundtrip(tokenizer, tmp_path):
    """Prefix runs: the fused decode-with-images program reproduces the
    live image path; text-only requests still work."""
    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    live = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                        resnet_params=resnet)

    out = str(tmp_path / "bundle")
    manifest = export_predictor(live, out, batch_sizes=(2,),
                                platforms=("cpu",), bake_weights=True)
    assert manifest["multimodal"]
    names = {p["name"] for p in manifest["programs"]}
    assert names == {"crf_decode_b2", "crf_decode_images_b2",
                     "crf_decode_images_noaux_b2"}

    served = load_exported_predictor(out, tokenizer)
    assert served.serves_images and served.export_rungs == (2,)
    rng = np.random.RandomState(0)
    images = rng.rand(2, 224, 224, 3).astype(np.float32)
    assert served.predict(SENTS[:2], images=images) \
        == live.predict(SENTS[:2], images=images)
    assert served.predict(SENTS[:2]) == live.predict(SENTS[:2])

    # partial batch WITH explicit aux crops: main AND aux images must both
    # pad up to the rung's frozen batch dim (regression: aux shipped
    # unpadded and the frozen program rejected the shape mismatch)
    aux = rng.rand(1, 3, 224, 224, 3).astype(np.float32)
    assert served.predict(SENTS[:1], images=images[:1], aux_images=aux) \
        == live.predict(SENTS[:1], images=images[:1], aux_images=aux)


def test_fp16_image_transfer_bundle_roundtrip(tokenizer, tmp_path):
    """A bundle exported from an image_dtype=float16 predictor freezes
    fp16 image inputs (half the upload bytes), records the dtype in the
    manifest, and the loaded predictor reproduces the live fp16 path."""
    import json as _json

    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    live = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                        resnet_params=resnet, image_dtype="float16")

    out = str(tmp_path / "bundle")
    manifest = export_predictor(live, out, batch_sizes=(2,),
                                platforms=("cpu",))
    assert manifest["image_dtype"] == "float16"
    with open(str(tmp_path / "bundle" / "manifest.json")) as f:
        assert _json.load(f)["image_dtype"] == "float16"

    served = load_exported_predictor(out, tokenizer)
    assert served.image_dtype == np.float16
    rng = np.random.RandomState(0)
    images = rng.rand(2, 224, 224, 3).astype(np.float32)
    assert served.predict(SENTS[:2], images=images) \
        == live.predict(SENTS[:2], images=images)


def test_uint8_image_transfer_bundle_roundtrip(tokenizer, tmp_path):
    """A bundle exported from an image_dtype=uint8 predictor freezes uint8
    image inputs (a quarter of the fp32 upload bytes; the ImageNet
    normalize re-runs inside the frozen program), records the dtype in
    the manifest, and the loaded predictor reproduces the live uint8
    path — including the partial-batch pad (mean-pixel rows that
    re-normalize to ~zero) and the explicit-aux variant."""
    import json as _json

    from mtvaf_tpu.nn.resnet import init_resnet_params

    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    live = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                        resnet_params=resnet, image_dtype="uint8")

    out = str(tmp_path / "bundle")
    manifest = export_predictor(live, out, batch_sizes=(2,),
                                platforms=("cpu",))
    assert manifest["image_dtype"] == "uint8"
    with open(str(tmp_path / "bundle" / "manifest.json")) as f:
        assert _json.load(f)["image_dtype"] == "uint8"

    served = load_exported_predictor(out, tokenizer)
    assert served.image_dtype == np.uint8
    rng = np.random.RandomState(0)
    images = rng.rand(2, 224, 224, 3).astype(np.float32)
    assert served.predict(SENTS[:2], images=images) \
        == live.predict(SENTS[:2], images=images)
    # partial batch + explicit aux crops (both pad to the frozen rung)
    aux = rng.rand(1, 3, 224, 224, 3).astype(np.float32)
    assert served.predict(SENTS[:1], images=images[:1], aux_images=aux) \
        == live.predict(SENTS[:1], images=images[:1], aux_images=aux)


def test_exported_predictor_behind_batching_server(crf_predictor, tokenizer,
                                                   tmp_path):
    """The bundle slots straight into the online tier (dispatch/collect)."""
    from mtvaf_tpu.serve import BatchingServer

    out = str(tmp_path / "bundle")
    export_predictor(crf_predictor, out, batch_sizes=(1, 4),
                     platforms=("cpu",))
    served = load_exported_predictor(out, tokenizer)
    want = crf_predictor.predict(SENTS + [SENTS[-1]])[:3]
    with BatchingServer(served, max_batch=4, max_wait_ms=20.0) as server:
        futs = [server.submit(s) for s in SENTS]
        got = [f.result(timeout=120) for f in futs]
    assert got == want


def test_multiplatform_lowering(crf_predictor, tokenizer, tmp_path):
    """Default platforms=('cpu','tpu') lowers both targets into one
    artifact; the cpu half must still execute here."""
    out = str(tmp_path / "bundle")
    manifest = export_predictor(crf_predictor, out, batch_sizes=(1,))
    assert manifest["platforms"] == ["cpu", "tpu"]
    served = load_exported_predictor(out, tokenizer)
    assert served.predict(SENTS[:1]) == crf_predictor.predict(SENTS[:1])


def test_shared_weights_bundle_roundtrip(crf_predictor, tokenizer, tmp_path):
    """bake_weights=False: programs take the param tree at runtime,
    weights.npz stores it once; predictions identical to the baked mode
    and the live predictor."""
    out = str(tmp_path / "bundle")
    manifest = export_predictor(crf_predictor, out, batch_sizes=(1, 4),
                                platforms=("cpu",))       # shared = default
    assert manifest["bake_weights"] is False
    assert os.path.exists(os.path.join(out, "weights.npz"))
    served = load_exported_predictor(out, tokenizer)
    assert served.predict(SENTS) == crf_predictor.predict(
        SENTS + [SENTS[-1]])[:3]
    # the whole point: program bytes no longer scale with the param count
    param_bytes = sum(np.asarray(x).nbytes for x in
                      jax.tree_util.tree_leaves(crf_predictor.params))
    for prog in manifest["programs"]:
        assert prog["bytes"] < param_bytes / 2


def test_shared_weights_multimodal_and_span(tokenizer, tmp_path):
    from mtvaf_tpu.nn.resnet import init_resnet_params

    # multimodal CRF: separate resnet.npz feeds the guide program
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    live = CrfPredictor(cfg, bert_cfg, params, tokenizer,
                        resnet_params=resnet)
    out = str(tmp_path / "mm")
    export_predictor(live, out, batch_sizes=(2,), platforms=("cpu",),
                     bake_weights=False)
    assert os.path.exists(os.path.join(out, "resnet.npz"))
    served = load_exported_predictor(out, tokenizer)
    images = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    assert served.predict(SENTS[:2], images=images) \
        == live.predict(SENTS[:2], images=images)

    # span: both stages take the shared tree
    scfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                  max_answer_length=4, logit_threshold=-100.0, bf16=False)
    sparams = init_span_model_params(jax.random.PRNGKey(0), scfg, bert_cfg)
    slive = SpanPredictor(scfg, bert_cfg, sparams, tokenizer)
    sout = str(tmp_path / "span")
    export_predictor(slive, sout, batch_sizes=(4,), platforms=("cpu",),
                     bake_weights=False)
    sserved = load_exported_predictor(sout, tokenizer)
    sents = ["great phone bad battery", "nice view", SENTS[0]]
    assert sserved.predict(sents) == slive.predict(sents + [sents[-1]])[:3]


def test_exported_span_predict_many(tokenizer, tmp_path):
    """Exported span bundles stream via dispatch/collect (the live
    predict_many drives live-only internals and must not be inherited)."""
    cfg = Config(dataset_name="twitter15", max_seq=24, n_best_size=6,
                 max_answer_length=4, logit_threshold=-100.0, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    live = SpanPredictor(cfg, bert_cfg, params, tokenizer)
    out = str(tmp_path / "bundle")
    export_predictor(live, out, batch_sizes=(4,), platforms=("cpu",))
    served = load_exported_predictor(out, tokenizer)
    sents = [f"review {i} great phone bad battery" for i in range(10)]
    assert served.predict_many(sents, batch_size=4) \
        == live.predict_many(sents, batch_size=4)
