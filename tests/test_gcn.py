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
