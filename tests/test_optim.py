"""Optimizer group + schedule tests (reference modules/train.py:461-493,
887-926)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params
from mtvaf_tpu.train.optim import (build_optimizer, linear_warmup_schedule)


class TestSchedule:
    def test_warmup_then_linear_decay(self):
        sched = linear_warmup_schedule(1.0, warmup_steps=10, total_steps=110)
        assert float(sched(0)) == 0.0
        assert float(sched(5)) == pytest.approx(0.5)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(60)) == pytest.approx(0.5)
        assert float(sched(110)) == pytest.approx(0.0)
        assert float(sched(200)) == 0.0

    def test_zero_warmup(self):
        sched = linear_warmup_schedule(2.0, 0, 100)
        assert float(sched(0)) == pytest.approx(2.0)

    def test_fractional_warmup_matches_hf_lambda(self):
        """The reference hands HF a FLOAT warmup count (warmup_ratio *
        train_num_steps, modules/train.py:464-466); HF's lambda compares and
        divides with the float, so every warmup lr differs from the
        truncated-int schedule whenever the product is fractional."""
        transformers = pytest.importorskip("transformers")
        from transformers.optimization import \
            _get_linear_schedule_with_warmup_lr_lambda as hf_lambda
        for total, ratio in ((7, 0.25), (12, 0.1), (5, 0.37), (9, 0.01)):
            w = ratio * total
            sched = linear_warmup_schedule(1.0, w, total)
            for step in range(total + 2):
                want = hf_lambda(step, num_warmup_steps=w,
                                 num_training_steps=total)
                np.testing.assert_allclose(float(sched(step)), want,
                                           rtol=1e-6, atol=1e-7,
                                           err_msg=f"total={total} "
                                                   f"ratio={ratio} s={step}")


class TestGroups:
    @pytest.fixture
    def setup(self):
        cfg = Config(dataset_name="twitter2015", use_prefix=True, use_18=True,
                     prefix_len=4)
        bert_cfg = BertConfig.tiny(hidden_size=32, num_attention_heads=4)
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        from mtvaf_tpu.nn.resnet import init_resnet_params
        params["resnet"] = init_resnet_params(jax.random.PRNGKey(1), depth=18)
        return cfg, params

    def _updates(self, cfg, params, groups_mode):
        opt, _ = build_optimizer(params, cfg, total_steps=100, pipeline="crf",
                                 groups_mode=groups_mode)
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        # step twice: lr warms up from 0 at step 0
        updates, state = opt.update(grads, state, params)
        p = jax.tree.map(lambda a, u: a + u, params, updates)
        updates, _ = opt.update(grads, state, p)
        return updates

    def test_resnet_frozen(self, setup):
        cfg, params = setup
        updates = self._updates(cfg, params, "all")
        for leaf in jax.tree.leaves(updates["resnet"]):
            assert np.all(np.asarray(leaf) == 0), "resnet must stay frozen"

    def test_bert_and_heads_train_in_all_mode(self, setup):
        cfg, params = setup
        updates = self._updates(cfg, params, "all")
        assert np.any(np.asarray(
            updates["bert"]["embeddings"]["word"]) != 0)
        assert np.any(np.asarray(updates["crf"]["transitions"]) != 0)
        assert np.any(np.asarray(
            updates["prefix"]["projectors"]["kernel"]) != 0)

    def test_reference_mode_freezes_projectors(self, setup):
        """groups_mode='reference' replicates the reference's group
        collection, which leaves the prefix projectors untrained
        (modules/train.py:904-909 matches only 'encoder_conv'/'gates')."""
        cfg, params = setup
        updates = self._updates(cfg, params, "reference")
        for leaf in jax.tree.leaves(updates["prefix"]["projectors"]):
            assert np.all(np.asarray(leaf) == 0)
        # but encoder_conv trains
        assert np.any(np.asarray(updates["prefix"]["conv_in"]["kernel"]) != 0)
        # and crf/fc train at the fast lr in both modes
        assert np.any(np.asarray(updates["crf"]["transitions"]) != 0)

    def test_crf_fast_lr(self, setup):
        """crf/fc group uses lr 5e-2 vs base 5e-5 → much larger updates."""
        cfg, params = setup
        opt, _ = build_optimizer(params, cfg, total_steps=100, pipeline="crf")
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        # advance past warmup
        updates = None
        p = params
        for _ in range(3):
            updates, state = opt.update(grads, state, p)
            p = jax.tree.map(lambda a, u: a + u, p, updates)
        crf_mag = np.abs(np.asarray(updates["crf"]["transitions"])).mean()
        bert_mag = np.abs(np.asarray(
            updates["bert"]["layers"]["attn"]["qkv"]["kernel"])).mean()
        assert crf_mag > 10 * bert_mag
