"""End-to-end visual-prefix pipeline: images on disk → ResNet guides →
prefix KVs → trainer, exercising GuideCache and the aux-crop map."""

import os

import numpy as np
import pytest

import jax

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.datasets import CrfDataset
from mtvaf_tpu.data.synthetic import (make_crf_files, make_images,
                                      make_vocab_file)
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params
from mtvaf_tpu.nn.resnet import init_resnet_params
from mtvaf_tpu.train.trainer_crf import CrfTrainer


def test_crf_trainer_with_visual_prefix(tmp_path):
    img_ids = [f"{700000 + i}.jpg" for i in range(4)]
    img_dir = tmp_path / "imgs"
    aux_dir = tmp_path / "aux"
    make_images(str(img_dir), img_ids, size=96)
    aux_names = [f"crop_{i}.jpg" for i in range(3)]
    make_images(str(aux_dir), aux_names, size=96)
    aux_map = {img_ids[0]: aux_names[:2], img_ids[1]: aux_names}

    tsv = tmp_path / "train.txt"
    anp = tmp_path / "anp.json"
    make_crf_files(str(tsv), str(anp), 6, seed=0, num_anp=8,
                   image_ids=img_ids)

    vocab = tmp_path / "vocab.txt"
    make_vocab_file(str(vocab))
    tokenizer = FullTokenizer(str(vocab))

    cfg = Config(dataset_name="twitter2015", use_prefix=True, use_18=True,
                 vao=True, prefix_len=4, num_anp_classes=8, max_seq=24,
                 train_batch_size=2, eval_batch_size=2, num_epochs=1,
                 eval_begin_epoch=99, bf16=False,
                 cache_dir=str(tmp_path / "cache"))
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))

    ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp),
                         img_dir=str(img_dir), aux_dir=str(aux_dir),
                         aux_map=aux_map)
    assert ds.image_store is not None

    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet_params = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                         dev_dataset=ds, test_dataset=ds,
                         resnet_params=resnet_params)
    assert trainer.guide_cache is not None
    trainer.train()
    # guides cached per unique image (4 images + placeholder-fallbacks)
    assert len(trainer.guide_cache._cache) >= 4
    # image .npy cache written
    assert os.path.isdir(tmp_path / "cache" / "img")


def test_span_trainer_with_visual_prefix(tmp_path):
    from mtvaf_tpu.data.datasets import SpanDataset
    from mtvaf_tpu.data.synthetic import make_span_file
    from mtvaf_tpu.train.trainer_span import SpanTrainer
    from mtvaf_tpu.nn.models import init_span_model_params

    img_ids = [f"img_{i}.jpg" for i in range(3)]
    img_dir = tmp_path / "imgs"
    make_images(str(img_dir), img_ids, size=96)
    train_f = tmp_path / "train.txt"
    make_span_file(str(train_f), 6, seed=0, image_ids=img_ids)
    vocab = tmp_path / "vocab.txt"
    make_vocab_file(str(vocab))
    tokenizer = FullTokenizer(str(vocab))

    cfg = Config(dataset_name="twitter15", use_prefix=True, use_18=True,
                 prefix_len=4, max_seq=24, train_batch_size=2,
                 eval_batch_size=2, num_epochs=1, eval_begin_epoch=1,
                 n_best_size=6, max_answer_length=4, bf16=False,
                 cache_dir=str(tmp_path / "cache"),
                 save_path=str(tmp_path / "out"))
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = SpanDataset.load(cfg, tokenizer, str(train_f),
                          img_dir=str(img_dir), aux_dir=str(img_dir),
                          aux_map={img_ids[0]: [img_ids[1]]})
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet_params = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                          dev_dataset=ds, test_dataset=ds,
                          resnet_params=resnet_params)
    assert trainer.guide_cache is not None
    trainer.train()
    f1 = trainer.test()
    assert 0.0 <= f1 <= 1.0


def test_missing_image_falls_back(tmp_path):
    from mtvaf_tpu.data.images import ImageStore
    store = ImageStore(str(tmp_path), None)
    img = store.main_image("does_not_exist.jpg")
    assert img.shape == (224, 224, 3)
    np.testing.assert_array_equal(img, np.zeros((224, 224, 3), np.float32))


def test_aux_map_torch_pth_roundtrip(tmp_path):
    """CLI aux-map loading reads the reference's torch-dict format
    (modules/dataset.py:36-37)."""
    torch = pytest.importorskip("torch")
    from mtvaf_tpu.cli.main import load_aux_map
    path = str(tmp_path / "dict.pth")
    torch.save({"a.jpg": ["crop1.jpg", "crop2.jpg"]}, path)
    m = load_aux_map(path)
    assert m == {"a.jpg": ["crop1.jpg", "crop2.jpg"]}
    assert load_aux_map(str(tmp_path / "missing.pth")) is None


def test_guide_cache_device_table(tmp_path):
    """Device-resident guide table: gather matches the host path (bf16
    quantization only), miss-bucket compile shapes, and full-table
    fallback."""
    import jax.numpy as jnp
    from mtvaf_tpu.data.images import ImageStore
    from mtvaf_tpu.train.trainer_span import GuideCache

    img_ids = [f"{800000 + i}.jpg" for i in range(5)]
    img_dir = tmp_path / "imgs"
    make_images(str(img_dir), img_ids, size=96)
    store = ImageStore(str(img_dir))
    resnet_params = init_resnet_params(jax.random.PRNGKey(1), depth=18)

    host = GuideCache(resnet_params, 18, device_items=0)
    dev = GuideCache(resnet_params, 18, device_items=8)

    hm, ha = host.batch(img_ids, store)
    dm, da = dev.batch(img_ids, store)
    assert isinstance(dm, jax.Array) and dm.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(dm, np.float32), hm,
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(da, np.float32), ha,
                               rtol=1e-2, atol=1e-2)

    # second call is a pure device gather (rows resident), repeated ids ok
    dm2, _ = dev.batch([img_ids[0], img_ids[0], img_ids[3]], store)
    np.testing.assert_allclose(np.asarray(dm2[0]), np.asarray(dm2[1]))

    # table smaller than the id set -> host fallback (np arrays)
    tiny = GuideCache(resnet_params, 18, device_items=2)
    tm, ta = tiny.batch(img_ids, store)
    assert isinstance(tm, np.ndarray)
    np.testing.assert_allclose(tm, hm, rtol=1e-6, atol=1e-6)


def test_crf_trainer_device_guide_table(tmp_path):
    """bf16 single-device run engages the device guide table end-to-end."""
    img_ids = [f"{900000 + i}.jpg" for i in range(4)]
    img_dir = tmp_path / "imgs"
    make_images(str(img_dir), img_ids, size=96)
    tsv, anp = tmp_path / "train.txt", tmp_path / "anp.json"
    make_crf_files(str(tsv), str(anp), 6, seed=0, num_anp=8,
                   image_ids=img_ids)
    vocab = tmp_path / "vocab.txt"
    make_vocab_file(str(vocab))
    tokenizer = FullTokenizer(str(vocab))

    cfg = Config(dataset_name="twitter2015", use_prefix=True, use_18=True,
                 vao=True, prefix_len=4, num_anp_classes=8, max_seq=24,
                 train_batch_size=2, eval_batch_size=2, num_epochs=1,
                 eval_begin_epoch=99, bf16=True, mesh_data=1)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    ds = CrfDataset.load(cfg, tokenizer, str(tsv), str(anp),
                         img_dir=str(img_dir))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    resnet_params = init_resnet_params(jax.random.PRNGKey(1), depth=18)
    trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                         dev_dataset=ds, test_dataset=ds,
                         resnet_params=resnet_params)
    assert trainer.guide_cache.device_items > 0
    trainer.train()
    assert len(trainer.guide_cache._dev_rows) >= 4
    y_true, y_pred, loss = trainer._predict(ds)
    assert np.isfinite(loss)
