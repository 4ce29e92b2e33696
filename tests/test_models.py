"""Full-model forward/loss tests on tiny shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import (compute_visual_guides, crf_model_forward,
                                 distant_cross_entropy,
                                 get_span_representation,
                                 init_crf_model_params, init_span_model_params,
                                 span_classification, span_extraction,
                                 span_model_loss)


@pytest.fixture(scope="module")
def tiny_cfgs():
    cfg = Config(dataset_name="twitter15", max_answer_length=4, n_best_size=6)
    bert_cfg = BertConfig.tiny()
    return cfg, bert_cfg


def make_span_batch(bert_cfg, b=2, s=12, m=6, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "input_ids": rng.randint(0, bert_cfg.vocab_size, (b, s)).astype(np.int32),
        "input_mask": np.ones((b, s), np.int32),
        "segment_ids": np.zeros((b, s), np.int32),
        "start_positions": np.zeros((b, s), np.int32),
        "end_positions": np.zeros((b, s), np.int32),
        "span_starts": np.zeros((b, m), np.int32),
        "span_ends": np.zeros((b, m), np.int32),
        "span_labels": np.zeros((b, m), np.int32),
        "span_masks": np.zeros((b, m), np.int32),
    }
    batch["start_positions"][:, 2] = 1
    batch["end_positions"][:, 3] = 1
    batch["span_starts"][:, 0] = 2
    batch["span_ends"][:, 0] = 3
    batch["span_labels"][:, 0] = 2
    batch["span_masks"][:, 0] = 1
    return {k: jnp.asarray(v) for k, v in batch.items()}


class TestDistantCE:
    def test_matches_formula(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        logits = rng.randn(3, 7).astype(np.float32)
        pos = np.zeros((3, 7), np.float32)
        pos[0, 1] = 1
        pos[1, [2, 4]] = 1
        pos[2, 6] = 1
        lp = torch.log_softmax(torch.tensor(logits), dim=-1)
        want = -1 * torch.mean(
            torch.sum(torch.tensor(pos) * lp, dim=-1) / torch.tensor(pos).sum(-1))
        got = distant_cross_entropy(jnp.asarray(logits), jnp.asarray(pos))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestSpanRepresentation:
    def test_gather_and_mask(self):
        seq = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
        starts = jnp.array([[1, 0], [3, 0]])
        ends = jnp.array([[2, 0], [5, 0]])
        emb, mask = get_span_representation(seq, starts, ends, max_span_width=4)
        assert emb.shape == (2, 2, 4, 3)
        assert mask.shape == (2, 2, 4)
        np.testing.assert_array_equal(np.asarray(mask[0, 0]), [1, 1, 0, 0])
        np.testing.assert_array_equal(np.asarray(mask[1, 0]), [1, 1, 1, 0])
        np.testing.assert_array_equal(np.asarray(emb[0, 0, 0]),
                                      np.asarray(seq[0, 1]))
        np.testing.assert_array_equal(np.asarray(emb[1, 0, 2]),
                                      np.asarray(seq[1, 5]))


class TestSpanModel:
    def test_loss_forward(self, tiny_cfgs):
        cfg, bert_cfg = tiny_cfgs
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        batch = make_span_batch(bert_cfg)
        out = span_model_loss(params, cfg, bert_cfg, batch)
        assert np.isfinite(float(out["loss"]))
        assert out["ac_logits"].shape == (2, 6, 4)
        assert out["start_logits"].shape == (2, 12)

    def test_grad_finite(self, tiny_cfgs):
        cfg, bert_cfg = tiny_cfgs
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        batch = make_span_batch(bert_cfg)
        g = jax.grad(lambda p: span_model_loss(p, cfg, bert_cfg, batch)["loss"])(params)
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_probe_path(self, tiny_cfgs):
        cfg, bert_cfg = tiny_cfgs
        cfg = cfg.replace(use_probe=True, probe_rank=16, probe_layer=2)
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        batch = make_span_batch(bert_cfg)
        out = span_model_loss(params, cfg, bert_cfg, batch)
        assert "probe_loss" in out and np.isfinite(float(out["probe_loss"]))

    def test_extraction_classification_split(self, tiny_cfgs):
        """Eval seam: extraction-only then classification-only."""
        cfg, bert_cfg = tiny_cfgs
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        batch = make_span_batch(bert_cfg)
        s, e, seq, captured = span_extraction(
            params, cfg, bert_cfg, batch["input_ids"], batch["input_mask"],
            batch["segment_ids"], capture_layer=2)
        ac = span_classification(params, cfg, seq, batch["span_starts"],
                                 batch["span_ends"])
        assert ac.shape == (2, 6, 4)
        assert captured.shape == seq.shape


class TestCRFModel:
    def test_loss_and_decode(self):
        cfg = Config(dataset_name="twitter2015")
        bert_cfg = BertConfig.tiny()
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        b, s = 2, 10
        rng = np.random.RandomState(0)
        batch = {
            "input_ids": jnp.asarray(
                rng.randint(0, bert_cfg.vocab_size, (b, s)), jnp.int32),
            "input_mask": jnp.asarray(
                np.array([[1] * 10, [1] * 6 + [0] * 4]), jnp.int32),
            "segment_ids": jnp.zeros((b, s), jnp.int32),
            "label_ids": jnp.asarray(rng.randint(1, cfg.num_crf_labels, (b, s)),
                                     jnp.int32),
            "imagelabel": jnp.zeros((b, cfg.num_anp_classes), jnp.float32),
        }
        out = crf_model_forward(params, cfg, bert_cfg, batch, with_decode=True)
        assert np.isfinite(float(out["loss"]))
        assert out["pred_tags"].shape == (b, s)
        assert np.asarray(out["lengths"]).tolist() == [10, 6]

    def test_prefix_and_vao(self):
        cfg = Config(dataset_name="twitter2015", use_prefix=True, use_18=True,
                     vao=True, prefix_len=4, num_anp_classes=11)
        bert_cfg = BertConfig.tiny()
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        b, s = 2, 8
        rng = np.random.RandomState(1)
        label = rng.dirichlet(np.ones(11), size=b).astype(np.float32)
        batch = {
            "input_ids": jnp.asarray(
                rng.randint(0, bert_cfg.vocab_size, (b, s)), jnp.int32),
            "input_mask": jnp.ones((b, s), jnp.int32),
            "segment_ids": jnp.zeros((b, s), jnp.int32),
            "label_ids": jnp.asarray(rng.randint(1, cfg.num_crf_labels, (b, s)),
                                     jnp.int32),
            "imagelabel": jnp.asarray(label),
        }
        main_g = jnp.asarray(rng.randn(b, 4, cfg.resnet_concat_channels),
                             jnp.float32)
        aux_g = jnp.asarray(rng.randn(b, 3, 4, cfg.resnet_concat_channels),
                            jnp.float32)
        out = crf_model_forward(params, cfg, bert_cfg, batch,
                                visual_guides=(main_g, aux_g))
        assert np.isfinite(float(out["loss"]))
        assert float(out["img_tag_loss"]) != 0.0
        # noauxloss drops the aux terms → smaller img loss
        cfg2 = cfg.replace(noauxloss=True)
        out2 = crf_model_forward(params, cfg2, bert_cfg, batch,
                                 visual_guides=(main_g, aux_g))
        assert float(out2["img_tag_loss"]) != float(out["img_tag_loss"])


class TestVisualGuides:
    def test_compute_guides_shapes(self):
        from mtvaf_tpu.nn.resnet import init_resnet_params
        params = init_resnet_params(jax.random.PRNGKey(0), depth=18)
        imgs = jnp.zeros((2, 64, 64, 3))
        aux = jnp.zeros((2, 3, 64, 64, 3))
        main_g, aux_g = compute_visual_guides(params, imgs, aux, depth=18)
        assert main_g.shape == (2, 4, 960)
        assert aux_g.shape == (2, 3, 4, 960)


class TestSpanEvalLossStep:
    """The eval-loss step (extraction outputs + candidate pack through
    span_model_tail) must equal the full span_model_loss forward with the
    same candidates — the reference's logged dev/test loss is that full
    forward (modules/train.py:197-199,295-305)."""

    @pytest.mark.parametrize("head", ["base", "probe", "digcn", "dualgcn"])
    def test_matches_full_forward(self, head):
        from mtvaf_tpu.train.steps import (make_extraction_step,
                                           make_span_eval_loss_step)
        cfg = Config(dataset_name="twitter15", max_answer_length=4,
                     n_best_size=6, bf16=False, use_probe=head == "probe",
                     gcn_layer_number=1 if head == "digcn" else 0,
                     num_layers=1 if head == "dualgcn" else 0,
                     num_epochs=3)
        bert_cfg = BertConfig.tiny(num_hidden_layers=8)  # probe taps layer 7
        params = init_span_model_params(jax.random.PRNGKey(3), cfg, bert_cfg)
        batch = make_span_batch(bert_cfg, b=3, s=12, m=cfg.n_best_size,
                                seed=4)
        grng = np.random.RandomState(6)
        if head == "digcn":
            # DiGCN eval re-encode path: valid-ids compression + adjacency
            batch = dict(batch, valid_ids=jnp.asarray(
                grng.randint(0, 2, (3, 12)), jnp.int32),
                adjacency_matrix=jnp.asarray(
                    (grng.rand(3, 12, 12) > 0.5), jnp.float32))
        if head == "dualgcn":
            batch = dict(batch, adj_matrix=jnp.asarray(
                (grng.rand(3, 12, 12) > 0.5), jnp.float32),
                src_mask=jnp.ones((3, 12), jnp.int32),
                aspect_mask=jnp.asarray(grng.randint(0, 2, (3, 12)),
                                        jnp.int32),
                polaritys=jnp.asarray(grng.randint(0, 3, (3,)), jnp.int32))
        # eval-branch candidates differ from the gold ones in the batch
        rng = np.random.RandomState(5)
        ss = rng.randint(0, 9, (3, cfg.n_best_size)).astype(np.int32)
        se = (ss + rng.randint(0, 3, ss.shape)).astype(np.int32)
        labels = rng.randint(0, 4, ss.shape).astype(np.int32)
        masks = rng.randint(0, 2, ss.shape).astype(np.int32)

        with jax.default_matmul_precision("highest"):
            full = span_model_loss(
                params, cfg, bert_cfg,
                dict(batch, span_starts=jnp.asarray(ss),
                     span_ends=jnp.asarray(se),
                     span_labels=jnp.asarray(labels),
                     span_masks=jnp.asarray(masks)), rng=None)
            s, e, seq, cap = make_extraction_step(cfg, bert_cfg)(params,
                                                                 batch)
            pack = jnp.asarray(np.stack([ss, se, labels, masks]), jnp.int32)
            ac, loss = make_span_eval_loss_step(cfg, bert_cfg)(
                params, batch, seq, s, e, cap, pack)
        np.testing.assert_allclose(np.asarray(loss),
                                   np.asarray(full["loss"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ac),
                                   np.asarray(full["ac_logits"]), rtol=1e-5,
                                   atol=1e-6)

    def test_zero_candidate_batch_nans_like_reference(self, tiny_cfgs):
        """Reference quirk: ac_loss = sum(mask·mean_CE)/mask.sum()
        (models/bert_model.py:302-303).  When the eval branch's filters
        reject EVERY candidate in a batch the 0/0 propagates NaN into the
        logged eval loss — torch does exactly this, so the logged loss must
        too (the factor cancels to exactly 1.0 whenever any mask is set)."""
        cfg, bert_cfg = tiny_cfgs
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        batch = make_span_batch(bert_cfg)
        out = span_model_loss(params, cfg, bert_cfg,
                              dict(batch, span_masks=jnp.zeros_like(
                                  batch["span_masks"])), rng=None)
        assert np.isnan(float(out["loss"]))
        # ...and with any candidate unmasked the loss is finite
        out2 = span_model_loss(params, cfg, bert_cfg, batch, rng=None)
        assert np.isfinite(float(out2["loss"]))
