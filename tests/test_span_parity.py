"""Span-model full-loss numerical parity vs a torch oracle composing the
reference math: BERT → binary affine start/end logits → distant CE, plus span
gather → self-attentive pool → dense/tanh → classifier → CE
(reference models/bert_model.py:246-376, dropout off, fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.core.convert import bert_params_from_torch
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_span_model_params, span_model_loss

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
F = torch.nn.functional


def test_span_model_loss_parity():
    cfg = Config(dataset_name="twitter15", max_answer_length=3, n_best_size=4,
                 bf16=False)
    bert_cfg = BertConfig.tiny()
    h = bert_cfg.hidden_size

    hf_cfg = transformers.BertConfig(
        vocab_size=bert_cfg.vocab_size, hidden_size=h,
        num_hidden_layers=bert_cfg.num_hidden_layers,
        num_attention_heads=bert_cfg.num_attention_heads,
        intermediate_size=bert_cfg.intermediate_size,
        max_position_embeddings=bert_cfg.max_position_embeddings,
        type_vocab_size=bert_cfg.type_vocab_size, attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg)
    hf.eval().double()

    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    params["bert"] = bert_params_from_torch(hf.state_dict(),
                                            bert_cfg.num_hidden_layers)

    rng = np.random.RandomState(0)
    b, s, m = 2, 12, 4
    input_ids = rng.randint(0, bert_cfg.vocab_size, (b, s)).astype(np.int32)
    input_mask = np.ones((b, s), np.int32)
    start_positions = np.zeros((b, s), np.int32)
    end_positions = np.zeros((b, s), np.int32)
    start_positions[:, 2] = 1
    start_positions[0, 5] = 1
    end_positions[:, 3] = 1
    end_positions[0, 6] = 1
    span_starts = np.zeros((b, m), np.int32)
    span_ends = np.zeros((b, m), np.int32)
    span_labels = np.zeros((b, m), np.int32)
    span_masks = np.zeros((b, m), np.int32)
    span_starts[:, 0] = 2
    span_ends[:, 0] = 3
    span_labels[:, 0] = 2
    span_masks[:, 0] = 1
    span_starts[0, 1] = 5
    span_ends[0, 1] = 6
    span_labels[0, 1] = 3
    span_masks[0, 1] = 1

    batch = {k: jnp.asarray(v) for k, v in dict(
        input_ids=input_ids, input_mask=input_mask,
        segment_ids=np.zeros((b, s), np.int32),
        start_positions=start_positions, end_positions=end_positions,
        span_starts=span_starts, span_ends=span_ends,
        span_labels=span_labels, span_masks=span_masks).items()}

    with jax.default_matmul_precision("highest"):
        out = span_model_loss(params, cfg, bert_cfg, batch, rng=None)

    # ---- torch oracle ----
    def t(x):
        return torch.tensor(np.asarray(x), dtype=torch.float64)

    with torch.no_grad():
        seq = hf(input_ids=torch.tensor(input_ids, dtype=torch.long),
                 attention_mask=torch.tensor(input_mask, dtype=torch.long)
                 ).last_hidden_state                                 # (B,S,H)
        ba_w, ba_b = t(params["binary_affine"]["kernel"]), \
            t(params["binary_affine"]["bias"])
        ae = seq @ ba_w + ba_b
        s_logits, e_logits = ae[..., 0], ae[..., 1]

        def distant_ce(logits, pos):
            lp = F.log_softmax(logits, dim=-1)
            pos = t(pos)
            return -torch.mean((pos * lp).sum(-1) / pos.sum(-1))

        ae_loss = (distant_ce(s_logits, start_positions)
                   + distant_ce(e_logits, end_positions)) / 2

        # span gather (reference flatten/cumsum path, simplified to direct
        # per-batch indexing — equivalent for in-bounds spans)
        W = cfg.max_answer_length
        span_emb = torch.zeros(b, m, W, h, dtype=torch.float64)
        span_mask_w = torch.zeros(b, m, W, dtype=torch.float64)
        for bi in range(b):
            for mi in range(m):
                width = span_ends[bi, mi] - span_starts[bi, mi] + 1
                for wi in range(W):
                    idx = min(span_starts[bi, mi] + wi, s - 1)
                    span_emb[bi, mi, wi] = seq[bi, idx]
                    span_mask_w[bi, mi, wi] = 1.0 if wi < width else 0.0
        ua_w, ua_b = t(params["unary_affine"]["kernel"]), \
            t(params["unary_affine"]["bias"])
        score = (span_emb @ ua_w + ua_b)[..., 0]
        score = score + (1.0 - span_mask_w) * -10000.0
        probs = F.softmax(score, dim=-1)
        pooled = (probs[..., None] * span_emb).sum(dim=2)
        d_w, d_b = t(params["dense"]["kernel"]), t(params["dense"]["bias"])
        pooled = torch.tanh(pooled @ d_w + d_b)
        c_w, c_b = t(params["classifier"]["kernel"]), t(params["classifier"]["bias"])
        ac_logits = pooled @ c_w + c_b                             # (B,M,4)

        flat = ac_logits.reshape(-1, 4)
        labels = torch.tensor(span_labels.reshape(-1), dtype=torch.long)
        # reference quirk: unmasked mean CE (models/bert_model.py:302-303)
        ac_loss = F.cross_entropy(flat, labels)
        tot = ae_loss + ac_loss

    np.testing.assert_allclose(float(out["ae_loss"]), float(ae_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(out["ac_loss"]), float(ac_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(out["loss"]), float(tot), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["ac_logits"]),
                               ac_logits.numpy(), atol=1e-4)
