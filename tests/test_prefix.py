"""Visual prefix projector parity vs a torch oracle of the reference math
(reference models/bert_model.py:379-414: encoder_conv, per-layer gates,
chunk re-weighting, raw head regroup)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.nn.prefix import (anp_kl_loss, build_prefix_kvs, encode_guides,
                                 init_prefix_params)

torch = pytest.importorskip("torch")
F = torch.nn.functional

L, H, DH = 4, 2, 8          # tiny: 4 layers, 2 heads, head_dim 8
HID = H * DH                # 16
OUT = 4 * 2 * HID           # 128 (4 chunks × 2 × hidden)
CIN, MID = 24, 10


@pytest.fixture
def params():
    rng = jax.random.PRNGKey(0)
    return init_prefix_params(rng, in_channels=CIN, mid_dim=MID,
                              hidden_size=HID, num_layers=L, with_anp=True,
                              num_anp_classes=7)


def torch_oracle(params, main, aux):
    """Reference get_visual_prompt math, written directly from the paper
    equations in float64 torch."""
    w1 = torch.tensor(np.asarray(params["conv_in"]["kernel"]), dtype=torch.float64)
    b1 = torch.tensor(np.asarray(params["conv_in"]["bias"]), dtype=torch.float64)
    w2 = torch.tensor(np.asarray(params["conv_out"]["kernel"]), dtype=torch.float64)
    b2 = torch.tensor(np.asarray(params["conv_out"]["bias"]), dtype=torch.float64)
    pw = torch.tensor(np.asarray(params["projectors"]["kernel"]), dtype=torch.float64)
    pb = torch.tensor(np.asarray(params["projectors"]["bias"]), dtype=torch.float64)

    def enc(x):
        return torch.tanh(x @ w1 + b1) @ w2 + b2

    main_t = torch.tensor(np.asarray(main), dtype=torch.float64)
    aux_t = torch.tensor(np.asarray(aux), dtype=torch.float64)
    bsz = main_t.shape[0]

    guid = enc(main_t)                       # (B, 4, OUT)
    aux_guids = [enc(aux_t[:, i]) for i in range(aux_t.shape[1])]

    split = guid.split(2 * HID, dim=-1)      # 4 × (B, 4, 2*HID)
    split_aux = [g.split(2 * HID, dim=-1) for g in aux_guids]

    result = []
    for idx in range(L):
        s = torch.stack(split).sum(0).reshape(bsz, -1) / 4
        gate = F.softmax(F.leaky_relu(s @ pw[idx] + pb[idx]), dim=-1)
        key_val = torch.zeros_like(split[0])
        for i in range(4):
            key_val = key_val + gate[:, i].view(-1, 1, 1) * split[i]
        aux_kvs = []
        for sa in split_aux:
            s_a = torch.stack(sa).sum(0).reshape(bsz, -1) / 4
            gate_a = F.softmax(F.leaky_relu(s_a @ pw[idx] + pb[idx]), dim=-1)
            kv_a = torch.zeros_like(sa[0])
            for i in range(4):
                kv_a = kv_a + gate_a[:, i].view(-1, 1, 1) * sa[i]
            aux_kvs.append(kv_a)
        kv = torch.cat([key_val] + aux_kvs, dim=1)   # (B, 16, 2*HID)
        k, v = kv.split(HID, dim=-1)
        k = k.reshape(bsz, H, -1, DH)
        v = v.reshape(bsz, H, -1, DH)
        result.append((k, v))
    return result


class TestPrefixParity:
    def test_kvs_match_reference_math(self, params):
        rng = np.random.RandomState(0)
        b = 2
        main = rng.randn(b, 4, CIN).astype(np.float32)
        aux = rng.randn(b, 3, 4, CIN).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            kvs, _ = build_prefix_kvs(params, jnp.asarray(main),
                                      jnp.asarray(aux), num_heads=H, head_dim=DH)
        assert kvs.shape == (L, 2, b, H, 16, DH)
        ref = torch_oracle(params, main, aux)
        for li in range(L):
            np.testing.assert_allclose(np.asarray(kvs[li, 0]),
                                       ref[li][0].numpy(), atol=1e-4,
                                       err_msg=f"key layer {li}")
            np.testing.assert_allclose(np.asarray(kvs[li, 1]),
                                       ref[li][1].numpy(), atol=1e-4,
                                       err_msg=f"value layer {li}")

    def test_main_only(self, params):
        main = jnp.asarray(np.random.RandomState(1).randn(2, 4, CIN),
                           jnp.float32)
        kvs, enc = build_prefix_kvs(params, main, None, num_heads=H, head_dim=DH)
        assert kvs.shape == (L, 2, 2, H, 4, DH)
        assert enc.shape == (2, 4, OUT)

    def test_anp_kl_loss_matches_torch(self, params):
        rng = np.random.RandomState(2)
        b = 3
        main = rng.randn(b, 4, CIN).astype(np.float32)
        aux = rng.randn(b, 3, 4, CIN).astype(np.float32)
        label = rng.dirichlet(np.ones(7), size=b).astype(np.float32)
        label[0, :3] = 0  # zeros exercise xlogy semantics
        label[0] /= label[0].sum()

        with jax.default_matmul_precision("highest"):
            enc_main = encode_guides(params, jnp.asarray(main))
            enc_aux = jnp.stack([encode_guides(params, jnp.asarray(aux[:, i]))
                                 for i in range(3)], axis=1)
            main_loss, aux_losses = anp_kl_loss(
                params, enc_main, enc_aux, jnp.asarray(label), rng=None)

        # torch oracle (dropout off)
        w = torch.tensor(np.asarray(params["img_classifier"]["kernel"]),
                         dtype=torch.float64)
        bias = torch.tensor(np.asarray(params["img_classifier"]["bias"]),
                            dtype=torch.float64)
        pooled = torch.tensor(np.asarray(enc_main), dtype=torch.float64).mean(1)
        logits = pooled @ w + bias
        log_probs = F.log_softmax(logits, dim=-1)
        want = F.kl_div(log_probs, torch.tensor(label, dtype=torch.float64),
                        reduction="batchmean")
        np.testing.assert_allclose(float(main_loss), float(want), rtol=1e-3)
        assert len(aux_losses) == 3
