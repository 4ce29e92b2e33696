"""Checkpoint, weight-conversion, and NER-transplant tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.checkpoint import (load_best, load_checkpoint, save_best,
                                       save_checkpoint, transplant)
from mtvaf_tpu.core.config import Config
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params, init_span_model_params


@pytest.fixture
def tiny_params():
    cfg = Config(dataset_name="twitter15")
    bert_cfg = BertConfig.tiny()
    return init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)


class TestBestModel:
    def test_roundtrip(self, tmp_path, tiny_params):
        path = str(tmp_path / "best_model.npz")
        save_best(path, tiny_params)
        zeros = jax.tree.map(jnp.zeros_like, tiny_params)
        restored = load_best(path, zeros)
        for a, b in zip(jax.tree.leaves(tiny_params),
                        jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOrbaxCheckpoint:
    def test_full_state_roundtrip(self, tmp_path, tiny_params):
        import optax
        from mtvaf_tpu.train.steps import create_train_state
        opt = optax.adamw(1e-4)
        state = create_train_state(tiny_params, opt)
        state = state._replace(step=jnp.asarray(7, jnp.int32))
        save_checkpoint(str(tmp_path / "ckpt"), state)
        zero_state = jax.tree.map(jnp.zeros_like, state)
        restored = load_checkpoint(str(tmp_path / "ckpt"), zero_state, 7)
        assert int(restored.step) == 7
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTransplant:
    def test_copies_bert_skips_heads_and_crf(self):
        cfg = Config(dataset_name="twitter2015")
        bert_cfg = BertConfig.tiny()
        target = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        source = init_crf_model_params(jax.random.PRNGKey(1), cfg, bert_cfg)

        merged = transplant(target, source)
        # bert weights come from source
        np.testing.assert_array_equal(
            np.asarray(merged["bert"]["embeddings"]["word"]),
            np.asarray(source["bert"]["embeddings"]["word"]))
        # crf stays from target
        np.testing.assert_array_equal(
            np.asarray(merged["crf"]["transitions"]),
            np.asarray(target["crf"]["transitions"]))

    def test_shape_mismatch_skipped(self, tiny_params):
        source = {"bert": {"embeddings": {"word": np.zeros((5, 5))}}}
        merged = transplant(tiny_params, source)
        np.testing.assert_array_equal(
            np.asarray(merged["bert"]["embeddings"]["word"]),
            np.asarray(tiny_params["bert"]["embeddings"]["word"]))


class TestProbeConversion:
    def test_probe_params_from_torch(self):
        torch = pytest.importorskip("torch")
        from mtvaf_tpu.core.convert import probe_params_from_torch
        sd = {"oneWordpsdProbe.proj": torch.randn(768, 384)}
        p = probe_params_from_torch(sd)
        assert p["proj"].shape == (768, 384)

    def test_reference_probe_checkpoint_loads(self):
        """The reference ships pretrained probe checkpoints — verify our
        converter reads that exact format (read-only; nothing copied)."""
        torch = pytest.importorskip("torch")
        path = "/root/reference/probes/psdProbe_base_savel7.pt"
        if not os.path.exists(path):
            pytest.skip("reference checkpoint not present")
        from mtvaf_tpu.core.convert import load_probe_checkpoint
        p = load_probe_checkpoint(path)
        assert p["proj"].shape == (768, 384)
