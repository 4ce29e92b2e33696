"""BERT encoder numerical parity vs HF transformers (random init, fp32).

The HF model here is only a test oracle — the framework never imports torch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.convert import bert_params_from_torch
from mtvaf_tpu.nn.bert import (BertConfig, bert_model, get_bert_output,
                               get_embedding_output, init_bert_params,
                               roberta_position_ids)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_hf_bert(cfg: BertConfig, seed=0):
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size, hidden_act="gelu",
        attn_implementation="eager")
    torch.manual_seed(seed)
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny():
    cfg = BertConfig.tiny()
    hf = make_hf_bert(cfg)
    params = bert_params_from_torch(hf.state_dict(), cfg.num_hidden_layers)
    return cfg, hf, params


def rand_inputs(cfg, b=2, s=10, seed=0):
    rng = np.random.RandomState(seed)
    input_ids = rng.randint(0, cfg.vocab_size, (b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, s - 3:] = 0
    return input_ids, mask


class TestHFParity:
    def test_last_hidden_parity(self, tiny):
        cfg, hf, params = tiny
        input_ids, mask = rand_inputs(cfg)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(input_ids, dtype=torch.long),
                     attention_mask=torch.tensor(mask, dtype=torch.long),
                     output_hidden_states=True)
        with jax.default_matmul_precision("highest"):
            out = bert_model(params, cfg, jnp.asarray(input_ids),
                             jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(out["last_hidden_state"]),
            ref.last_hidden_state.numpy(), atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["pooler_output"]), ref.pooler_output.numpy(),
            atol=2e-5, rtol=2e-5)

    def test_all_hidden_states_parity(self, tiny):
        cfg, hf, params = tiny
        input_ids, mask = rand_inputs(cfg, seed=1)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(input_ids, dtype=torch.long),
                     attention_mask=torch.tensor(mask, dtype=torch.long),
                     output_hidden_states=True)
        with jax.default_matmul_precision("highest"):
            out = bert_model(params, cfg, jnp.asarray(input_ids),
                             jnp.asarray(mask), collect_all_hidden=True,
                             capture_layer=2)
        assert out["hidden_states"].shape[0] == cfg.num_hidden_layers + 1
        # captured layer equals the stacked entry
        np.testing.assert_allclose(np.asarray(out["captured_hidden"]),
                                   np.asarray(out["hidden_states"][2]),
                                   atol=1e-6)
        for i, h_ref in enumerate(ref.hidden_states):
            np.testing.assert_allclose(
                np.asarray(out["hidden_states"][i]), h_ref.numpy(),
                atol=2e-5, rtol=2e-5, err_msg=f"layer {i}")

    def test_prefix_kv_parity_manual(self, tiny):
        """Prefix-KV attention vs manual torch computation with the reference
        semantics: concat prefix K/V, no position shift, prepended ones mask
        (reference models/modeling_bert.py:282-286,1049-1050)."""
        cfg, hf, params = tiny
        b, s, p = 2, 8, 3
        nh, dh = cfg.num_attention_heads, cfg.head_dim
        input_ids, mask = rand_inputs(cfg, b=b, s=s, seed=2)
        rng = np.random.RandomState(3)
        prefix = rng.randn(cfg.num_hidden_layers, 2, b, nh, p, dh).astype(np.float32)
        prompt_mask = np.concatenate([np.ones((b, p), np.int32), mask], axis=1)

        # Torch oracle: run HF embeddings then layers manually with prefix.
        with torch.no_grad():
            tt_ids = torch.tensor(input_ids, dtype=torch.long)
            hidden = hf.embeddings(input_ids=tt_ids)
            ext_mask = (1.0 - torch.tensor(prompt_mask, dtype=torch.float32)
                        )[:, None, None, :] * -10000.0
            def heads(x):
                return x.view(b, s, nh, dh).permute(0, 2, 1, 3)

            for li, layer in enumerate(hf.encoder.layer):
                sa = layer.attention.self
                q = heads(sa.query(hidden))
                k = heads(sa.key(hidden))
                v = heads(sa.value(hidden))
                pk = torch.tensor(prefix[li, 0])
                pv = torch.tensor(prefix[li, 1])
                k = torch.cat([pk, k], dim=2)
                v = torch.cat([pv, v], dim=2)
                scores = q @ k.transpose(-1, -2) / np.sqrt(dh) + ext_mask
                probs = torch.softmax(scores, dim=-1)
                ctx = (probs @ v).permute(0, 2, 1, 3).reshape(b, s, -1)
                attn_out = layer.attention.output.dense(ctx)
                hidden = layer.attention.output.LayerNorm(hidden + attn_out)
                mlp = layer.intermediate(hidden)
                mlp = layer.output.dense(mlp)
                hidden = layer.output.LayerNorm(hidden + mlp)
            ref_last = hidden.numpy()

        with jax.default_matmul_precision("highest"):
            out = bert_model(params, cfg, jnp.asarray(input_ids),
                             jnp.asarray(prompt_mask),
                             prefix_kvs=jnp.asarray(prefix))
        np.testing.assert_allclose(np.asarray(out["last_hidden_state"]),
                                   ref_last, atol=2e-5, rtol=2e-5)

    def test_split_forward_matches_full(self, tiny):
        cfg, _, params = tiny
        input_ids, mask = rand_inputs(cfg, seed=4)
        with jax.default_matmul_precision("highest"):
            full = bert_model(params, cfg, jnp.asarray(input_ids),
                              jnp.asarray(mask))
            emb = get_embedding_output(params, cfg, jnp.asarray(input_ids))
            split = get_bert_output(params, cfg, emb, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(full["last_hidden_state"]),
                                   np.asarray(split["last_hidden_state"]),
                                   atol=1e-6)


class TestRoberta:
    def test_position_ids(self):
        ids = jnp.array([[5, 7, 9, 1, 1], [5, 1, 1, 1, 1]])
        pos = roberta_position_ids(ids, pad_token_id=1)
        np.testing.assert_array_equal(
            np.asarray(pos), [[2, 3, 4, 1, 1], [2, 1, 1, 1, 1]])

    def test_hf_roberta_parity(self):
        cfg = BertConfig.tiny(is_roberta=True)
        hf_cfg = transformers.RobertaConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size, pad_token_id=1,
            attn_implementation="eager")
        torch.manual_seed(0)
        hf = transformers.RobertaModel(hf_cfg)
        hf.eval()
        params = bert_params_from_torch(hf.state_dict(), cfg.num_hidden_layers)
        rng = np.random.RandomState(0)
        input_ids = rng.randint(2, cfg.vocab_size, (2, 9)).astype(np.int32)
        input_ids[0, 6:] = 1
        mask = (input_ids != 1).astype(np.int32)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(input_ids, dtype=torch.long),
                     attention_mask=torch.tensor(mask, dtype=torch.long))
        with jax.default_matmul_precision("highest"):
            out = bert_model(params, cfg, jnp.asarray(input_ids),
                             jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out["last_hidden_state"]),
                                   ref.last_hidden_state.numpy(),
                                   atol=2e-5, rtol=2e-5)


class TestInitShapes:
    def test_init_params_shapes(self, rng_key):
        cfg = BertConfig.tiny()
        params = init_bert_params(rng_key, cfg)
        assert params["layers"]["attn"]["qkv"]["kernel"].shape == \
            (cfg.num_hidden_layers, cfg.hidden_size, 3 * cfg.hidden_size)
        out = bert_model(params, cfg,
                         jnp.zeros((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32))
        assert out["last_hidden_state"].shape == (2, 6, cfg.hidden_size)


class TestRemat:
    def test_remat_matches_plain_grads(self):
        """jax.checkpoint-ed encoder: identical loss and gradients."""
        import dataclasses
        import numpy as np
        import jax
        import jax.numpy as jnp
        from mtvaf_tpu.nn.bert import BertConfig, bert_model, init_bert_params

        cfg = BertConfig.tiny()
        rng = jax.random.PRNGKey(0)
        params = init_bert_params(rng, cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0,
                                 cfg.vocab_size)

        # random linear readout: sum(LN(x)^2) would be ~constant (LN fixes
        # the row norm) and its vanishing grads compare pure fp32 noise
        w = jax.random.normal(jax.random.PRNGKey(2),
                              (2, 10, cfg.hidden_size))

        def loss(p, c):
            out = bert_model(p, c, ids)
            return jnp.sum(out["last_hidden_state"] * w)

        cfg_r = dataclasses.replace(cfg, remat=True)
        l0, g0 = jax.value_and_grad(loss)(params, cfg)
        l1, g1 = jax.value_and_grad(loss)(params, cfg_r)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        # recomputation reassociates fp32 reductions — epsilon-level drift
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g0, g1)

    def test_gelu_custom_vjp_matches_autodiff(self):
        """The analytic gelu backward (layers._gelu_bwd) against plain
        autodiff of the erf form — every remat/parity test routes through
        the custom VJP on BOTH sides, so without this pin a derivative
        error would corrupt all training gradients invisibly."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from mtvaf_tpu.nn.layers import gelu

        x = jnp.asarray(np.random.RandomState(0).randn(512) * 3,
                        jnp.float32)
        g_custom = jax.grad(lambda v: jnp.sum(gelu(v)))(x)
        g_auto = jax.grad(lambda v: jnp.sum(
            jax.nn.gelu(v, approximate=False)))(x)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                                   rtol=1e-5, atol=1e-6)
        # forward unchanged
        np.testing.assert_array_equal(
            np.asarray(gelu(x)),
            np.asarray(jax.nn.gelu(x, approximate=False)))
        # bf16 path: bwd computed in fp32, cast back
        xb = x.astype(jnp.bfloat16)
        gb = jax.grad(lambda v: jnp.sum(gelu(v).astype(jnp.float32)))(xb)
        assert gb.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(gb, np.float32),
                                   np.asarray(g_auto), rtol=0.05, atol=0.02)

    def test_selective_remat_matches_plain_grads(self):
        """Attention-core checkpointing (default ON): same loss and grads
        as the fully-stashed backward, including the regenerated attention
        dropout mask (the replay reuses the same per-layer rng)."""
        import dataclasses
        import numpy as np
        import jax
        import jax.numpy as jnp
        from mtvaf_tpu.nn.bert import BertConfig, bert_model, init_bert_params

        cfg_on = BertConfig.tiny()
        assert cfg_on.selective_remat
        cfg_off = dataclasses.replace(cfg_on, selective_remat=False)
        params = init_bert_params(jax.random.PRNGKey(0), cfg_on)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0,
                                 cfg_on.vocab_size)
        w = jax.random.normal(jax.random.PRNGKey(2),
                              (2, 10, cfg_on.hidden_size))
        drng = jax.random.PRNGKey(3)   # dropout ACTIVE: masks must regenerate

        def loss(p, c):
            out = bert_model(p, c, ids, rng=drng)
            return jnp.sum(out["last_hidden_state"] * w)

        l0, g0 = jax.value_and_grad(loss)(params, cfg_off)
        l1, g1 = jax.value_and_grad(loss)(params, cfg_on)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g0, g1)

    def test_from_hf_dir_reads_config(self, tmp_path):
        import json
        from mtvaf_tpu.nn.bert import BertConfig
        (tmp_path / "config.json").write_text(json.dumps({
            "model_type": "bert", "vocab_size": 1234, "hidden_size": 1024,
            "num_hidden_layers": 24, "num_attention_heads": 16,
            "intermediate_size": 4096}))
        c = BertConfig.from_hf_dir(str(tmp_path))
        assert (c.vocab_size, c.hidden_size, c.num_hidden_layers,
                c.num_attention_heads, c.intermediate_size) == \
            (1234, 1024, 24, 16, 4096)
        assert not c.is_roberta
        # no config.json -> base defaults
        assert BertConfig.from_hf_dir(str(tmp_path / "nope")) == \
            BertConfig.base()


class TestPaddingIdxGradient:
    """torch nn.Embedding(padding_idx=pad) hard-zeroes d loss/d table[pad];
    a plain JAX gather backprops into the pad row instead.  The span model's
    distant-CE softmax runs over pad positions (models/bert_model.py:181-190
    has no mask), so without the pad-position stop_gradient in
    bert_embeddings the [PAD] row drifts off zero and training trajectories
    diverge from the reference (caught by test_reference_trainer_e2e)."""

    def test_word_embedding_grad_parity_on_padded_batch(self, tiny):
        cfg, hf, params = tiny
        input_ids, mask = rand_inputs(cfg, seed=3)
        input_ids[:, -4:] = 0                       # real [PAD] positions
        mask[:, -4:] = 0

        t_ids = torch.tensor(input_ids, dtype=torch.long)
        t_mask = torch.tensor(mask, dtype=torch.long)
        # a loss that sums over ALL positions, pads included, like the
        # reference span model's unmasked distant CE
        out = hf(input_ids=t_ids, attention_mask=t_mask).last_hidden_state
        out.sum().backward()
        g_ref = hf.embeddings.word_embeddings.weight.grad.detach().numpy()
        hf.zero_grad()

        def loss(p):
            with jax.default_matmul_precision("highest"):
                o = bert_model(p, cfg, jnp.asarray(input_ids),
                               jnp.asarray(mask))
            return o["last_hidden_state"].sum()

        g = np.asarray(jax.grad(loss)(params)["embeddings"]["word"])
        assert np.all(g[cfg.pad_token_id] == 0.0)
        assert np.abs(g_ref[cfg.pad_token_id]).max() == 0.0
        np.testing.assert_allclose(g, g_ref, atol=2e-4, rtol=2e-4)

    def test_init_zeroes_pad_row(self, rng_key):
        from mtvaf_tpu.nn.bert import init_bert_params
        cfg = BertConfig.tiny()
        p = init_bert_params(rng_key, cfg)
        assert np.all(np.asarray(p["embeddings"]["word"][cfg.pad_token_id])
                      == 0.0)
