"""GCN head tests: shapes, masking, and wiring into the span model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.gcn import (digcn_forward, dualgcn_forward,
                              init_digcn_params, init_dualgcn_params)


def test_digcn_shapes():
    params = init_digcn_params(jax.random.PRNGKey(0), 2, 16)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    adj = jnp.ones((2, 6, 6))
    out = digcn_forward(params, h, adj)
    assert out.shape == (2, 6, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) >= 0)  # relu output


def test_dualgcn_logits_and_penalty():
    cfg = Config(dataset_name="twitter15", num_layers=2)
    params = init_dualgcn_params(jax.random.PRNGKey(0), 2, 16,
                                 attention_heads=4)
    seq = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    adj = jnp.ones((2, 6, 6))
    src_mask = jnp.ones((2, 6), jnp.int32)
    aspect_mask = jnp.zeros((2, 6), jnp.int32).at[:, 1].set(1)
    logits, penal = dualgcn_forward(params, cfg, seq, pooled, adj, src_mask,
                                    aspect_mask, heads=4)
    assert logits.shape == (2, 3)
    assert np.isfinite(float(penal))


def test_span_model_with_dualgcn():
    from mtvaf_tpu.nn.models import init_span_model_params, span_model_loss
    from tests.test_models import make_span_batch

    cfg = Config(dataset_name="twitter15", num_layers=1, max_answer_length=4)
    bert_cfg = BertConfig.tiny()
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    assert "dualgcn" in params
    batch = make_span_batch(bert_cfg)
    b, s = batch["input_ids"].shape
    batch["adj_matrix"] = jnp.ones((b, s, s))
    batch["src_mask"] = batch["input_mask"]
    batch["aspect_mask"] = jnp.zeros((b, s), jnp.int32).at[:, 2].set(1)
    batch["polaritys"] = jnp.zeros((b,), jnp.int32)
    out = span_model_loss(params, cfg, bert_cfg, batch)
    assert "tat_loss" in out
    assert np.isfinite(float(out["loss"]))


def test_span_model_with_digcn():
    from mtvaf_tpu.nn.models import init_span_model_params, span_model_loss
    from tests.test_models import make_span_batch

    cfg = Config(dataset_name="twitter15", gcn_layer_number=1,
                 max_answer_length=4)
    bert_cfg = BertConfig.tiny()
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    assert "digcn" in params
    batch = make_span_batch(bert_cfg)
    b, s = batch["input_ids"].shape
    batch["adjacency_matrix"] = jnp.ones((b, s, s))
    out = span_model_loss(params, cfg, bert_cfg, batch)
    assert np.isfinite(float(out["loss"]))


def test_compress_valid_ids_matches_reference_loop():
    """Static-shape compaction vs the reference's per-example Python loop
    (models/bert_model.py:271-281)."""
    from mtvaf_tpu.nn.gcn import compress_valid_ids
    rs = np.random.RandomState(0)
    b, s, h = 3, 10, 8
    seq = rs.randn(b, s, h).astype(np.float32)
    valid = (rs.rand(b, s) < 0.6).astype(np.int32)
    got = np.asarray(compress_valid_ids(jnp.asarray(seq), jnp.asarray(valid)))
    ref = np.zeros_like(seq)
    for i in range(b):
        rows = seq[i][valid[i] == 1]
        ref[i, :rows.shape[0]] = rows
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_span_model_digcn_valid_ids_and_dep_embedding():
    """valid_ids triggers the compression before the DiGCN (reference
    models/bert_model.py:271-284) and dep_embedding exists with a zero
    padding row (constructed but unused in the reference forward, :235)."""
    from mtvaf_tpu.nn.models import init_span_model_params, span_model_loss
    from tests.test_models import make_span_batch

    cfg = Config(dataset_name="twitter15", gcn_layer_number=1,
                 max_answer_length=4)
    bert_cfg = BertConfig.tiny()
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    assert params["dep_embedding"].shape == (cfg.type_num,
                                             bert_cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(params["dep_embedding"][0]), 0.0)
    batch = make_span_batch(bert_cfg)
    b, s = batch["input_ids"].shape
    batch["adjacency_matrix"] = jnp.ones((b, s, s))
    base = span_model_loss(params, cfg, bert_cfg, batch)
    batch["valid_ids"] = jnp.ones((b, s), jnp.int32).at[:, 1::2].set(0)
    out = span_model_loss(params, cfg, bert_cfg, batch)
    assert np.isfinite(float(out["loss"]))
    # compression changes the GCN input, hence the loss
    assert float(out["loss"]) != pytest.approx(float(base["loss"]))
