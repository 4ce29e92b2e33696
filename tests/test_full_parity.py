"""Full-model numerical parity: visual guides → prefix KVs → BERT+prefix →
emission head, against a torch oracle composing the reference math
(models/bert_model.py:480-532 minus dropout, fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.core.convert import bert_params_from_torch
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import crf_model_forward, init_crf_model_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
F = torch.nn.functional


def test_crf_model_emission_parity():
    cfg = Config(dataset_name="twitter2015", use_prefix=True, use_18=True,
                 prefix_len=4, bf16=False)
    bert_cfg = BertConfig.tiny()   # hidden 32, 4 heads, 4 layers
    h, nh = bert_cfg.hidden_size, bert_cfg.num_attention_heads
    dh = bert_cfg.head_dim
    L = bert_cfg.num_hidden_layers

    # HF torch BERT as weight source + oracle.
    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=h,
        num_hidden_layers=L, num_attention_heads=nh,
        intermediate_size=bert_cfg.intermediate_size,
        max_position_embeddings=bert_cfg.max_position_embeddings,
        type_vocab_size=bert_cfg.type_vocab_size, attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg)
    hf.eval()

    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    params["bert"] = bert_params_from_torch(hf.state_dict(), L)

    rng = np.random.RandomState(0)
    b, s = 2, 10
    cin = cfg.resnet_concat_channels
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, bert_cfg.vocab_size, (b, s)),
                                 jnp.int32),
        "input_mask": jnp.asarray(np.array([[1] * 10, [1] * 7 + [0] * 3]),
                                  jnp.int32),
        "segment_ids": jnp.zeros((b, s), jnp.int32),
        "label_ids": jnp.asarray(rng.randint(1, cfg.num_crf_labels, (b, s)),
                                 jnp.int32),
        "imagelabel": jnp.zeros((b, cfg.num_anp_classes), jnp.float32),
    }
    main_g = rng.randn(b, 4, cin).astype(np.float32)
    aux_g = rng.randn(b, 3, 4, cin).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        out = crf_model_forward(
            params, cfg, bert_cfg, batch,
            visual_guides=(jnp.asarray(main_g), jnp.asarray(aux_g)),
            rng=None, with_loss=True, with_decode=True)

    # ---- torch oracle ----
    def t(x):
        return torch.tensor(np.asarray(x), dtype=torch.float64)

    pp = params["prefix"]
    w1, b1 = t(pp["conv_in"]["kernel"]), t(pp["conv_in"]["bias"])
    w2, b2 = t(pp["conv_out"]["kernel"]), t(pp["conv_out"]["bias"])
    pw, pb = t(pp["projectors"]["kernel"]), t(pp["projectors"]["bias"])

    def enc(x):
        return torch.tanh(x @ w1 + b1) @ w2 + b2

    guid = enc(t(main_g))
    aux_guids = [enc(t(aux_g)[:, i]) for i in range(3)]
    split = guid.split(2 * h, dim=-1)
    split_aux = [g.split(2 * h, dim=-1) for g in aux_guids]

    prefix_kvs = []
    for idx in range(L):
        def gated(chunks):
            s_sum = torch.stack(chunks).sum(0).reshape(b, -1) / 4
            gate = F.softmax(F.leaky_relu(s_sum @ pw[idx] + pb[idx]), dim=-1)
            kv = torch.zeros_like(chunks[0])
            for i in range(4):
                kv = kv + gate[:, i].view(-1, 1, 1) * chunks[i]
            return kv
        kv = torch.cat([gated(split)] + [gated(sa) for sa in split_aux], dim=1)
        k, v = kv.split(h, dim=-1)
        prefix_kvs.append((k.reshape(b, nh, -1, dh), v.reshape(b, nh, -1, dh)))

    p_slots = prefix_kvs[0][0].shape[2]
    prompt_mask = np.concatenate(
        [np.ones((b, p_slots), np.int64), np.asarray(batch["input_mask"])],
        axis=1)

    hf = hf.double()
    with torch.no_grad():
        hidden = hf.embeddings(
            input_ids=torch.tensor(np.asarray(batch["input_ids"]),
                                   dtype=torch.long))
        ext = (1.0 - torch.tensor(prompt_mask, dtype=torch.float64)
               )[:, None, None, :] * -10000.0
        for li, layer in enumerate(hf.encoder.layer):
            sa = layer.attention.self
            def heads(x):
                return x.view(b, s, nh, dh).permute(0, 2, 1, 3)
            q = heads(sa.query(hidden))
            k = heads(sa.key(hidden))
            v = heads(sa.value(hidden))
            k = torch.cat([prefix_kvs[li][0], k], dim=2)
            v = torch.cat([prefix_kvs[li][1], v], dim=2)
            scores = q @ k.transpose(-1, -2) / np.sqrt(dh) + ext
            probs = torch.softmax(scores, dim=-1)
            ctx = (probs @ v).permute(0, 2, 1, 3).reshape(b, s, -1)
            hidden = layer.attention.output.LayerNorm(
                hidden + layer.attention.output.dense(ctx))
            hidden = layer.output.LayerNorm(
                hidden + layer.output.dense(layer.intermediate(hidden)))
        fc_w = t(params["fc"]["kernel"])
        fc_b = t(params["fc"]["bias"])
        ref_emissions = (hidden @ fc_w + fc_b).numpy()

    np.testing.assert_allclose(np.asarray(out["emissions"]), ref_emissions,
                               atol=5e-4, rtol=5e-4)
