"""Visual prefix generator — the multi-scale fusion core (SURVEY.md C5).

Reproduces ``get_visual_prompt`` (reference models/bert_model.py:379-414 and
the ANP-loss variant :534-588):

  guides (B, 4, C) → encoder_conv MLP (C→800→6144) → 4 chunks of 1536 →
  12 per-layer softmax(leaky_relu(Linear(6144→4))) gates re-weighting the
  chunks → main + 3 aux crops concatenated into 16 prefix slots →
  per-layer (key, value) of shape (B, 12, 16, 64).

TPU-first: the reference loops over 12 layers × 4 chunks × 3 aux crops in
Python (~200 tiny ops); here the gates for all layers are one batched matmul
and the re-weighting a single einsum, emitting the stacked
``(L, 2, B, H, P, Dh)`` prefix tensor the scan-based encoder consumes.  The
final reshape to heads matches torch's raw C-order regroup bit-for-bit so
converted reference checkpoints behave identically.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import dense, dense_init, dropout


def init_prefix_params(rng, *, in_channels: int = 3840, mid_dim: int = 800,
                       hidden_size: int = 768, num_layers: int = 12,
                       num_chunks: int = 4, num_anp_classes: int = 2089,
                       with_anp: bool = False, num_aux: int = 3) -> Dict:
    out_dim = num_chunks * 2 * hidden_size            # 6144
    ks = jax.random.split(rng, 6)
    params = {
        "conv_in": dense_init(ks[0], in_channels, mid_dim),
        "conv_out": dense_init(ks[1], mid_dim, out_dim),
        # 12 per-layer gate projectors, stacked (L, 6144, 4) / (L, 4).
        "projectors": {
            "kernel": jax.random.normal(ks[2], (num_layers, out_dim, num_chunks))
            / jnp.sqrt(out_dim),
            "bias": jnp.zeros((num_layers, num_chunks)),
        },
    }
    if with_anp:
        params["img_classifier"] = dense_init(ks[3], out_dim, num_anp_classes)
        params["aux_img_classifiers"] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[dense_init(k, out_dim, num_anp_classes)
              for k in jax.random.split(ks[4], num_aux)])
    return params


def encode_guides(params: Dict, guides: jnp.ndarray) -> jnp.ndarray:
    """encoder_conv MLP: (B, 4, C) → (B, 4, 6144)
    (reference models/bert_model.py:224-228)."""
    h = jnp.tanh(dense(params["conv_in"], guides))
    return dense(params["conv_out"], h)


def _gates(params: Dict, encoded: jnp.ndarray) -> jnp.ndarray:
    """All-layer chunk gates: (B, 4, 6144) encoded → (L, B, 4) softmax weights.

    ``sum_prefix_guids`` = mean over the 4 prefix rows flattened chunk-wise
    (reference models/bert_model.py:392-394): stack of 4 chunks (B,4,1536)
    summed /4 then flattened → equals mean over rows of the (B, 4, 6144)
    encoding reshaped to (B, 6144) chunk-major.
    """
    b = encoded.shape[0]
    num_chunks = params["projectors"]["kernel"].shape[-1]
    # chunks[i] = encoded[..., i*1536:(i+1)*1536]  → stack.sum(0)/4 .view(B,-1)
    chunks = jnp.stack(jnp.split(encoded, num_chunks, axis=-1))  # (4, B, 4, 1536)
    summed = chunks.sum(0).reshape(b, -1) / num_chunks           # (B, 6144)
    logits = jnp.einsum("bd,ldg->lbg", summed, params["projectors"]["kernel"]) \
        + params["projectors"]["bias"][:, None, :]
    return jax.nn.softmax(jax.nn.leaky_relu(logits, 0.01), axis=-1)  # (L, B, 4)


def _gated_chunks(params: Dict, encoded: jnp.ndarray) -> jnp.ndarray:
    """Per-layer gated re-weighting: (B, 4, 6144) → (L, B, 4, 1536)."""
    num_chunks = params["projectors"]["kernel"].shape[-1]
    chunks = jnp.stack(jnp.split(encoded, num_chunks, axis=-1))  # (4,B,4,1536)
    gates = _gates(params, encoded)                              # (L,B,4)
    return jnp.einsum("lbg,gbph->lbph", gates, chunks)


def build_prefix_kvs(params: Dict, main_guides: jnp.ndarray,
                     aux_guides: Optional[jnp.ndarray], *,
                     num_heads: int = 12, head_dim: int = 64
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full visual prompt.

    main_guides: (B, 4, C) stage-guide packing from resnet_stage_guides.
    aux_guides: (B, A, 4, C) for A aux crops, or None.
    Returns (prefix_kvs (L, 2, B, H, P, Dh), encoded_main (B, 4, 6144)); the
    encoded activations feed the ANP loss.
    """
    L = params["projectors"]["kernel"].shape[0]
    b = main_guides.shape[0]
    hidden = num_heads * head_dim

    encoded_main = encode_guides(params, main_guides)         # (B,4,6144)
    kv_rows = _gated_chunks(params, encoded_main)             # (L,B,4,1536)
    if aux_guides is not None:
        a = aux_guides.shape[1]
        enc_aux = encode_guides(params, aux_guides.reshape(b * a, *aux_guides.shape[2:]))
        aux_rows = _gated_chunks(params, enc_aux)             # (L, B*A, 4, 1536)
        aux_rows = aux_rows.reshape(L, b, a, 4, 2 * hidden)
        aux_rows = aux_rows.reshape(L, b, a * 4, 2 * hidden)
        kv_rows = jnp.concatenate([kv_rows, aux_rows], axis=2)  # (L,B,16,1536)

    p_slots = kv_rows.shape[2]
    key = kv_rows[..., :hidden]                               # (L,B,P,768)
    value = kv_rows[..., hidden:]
    # torch's raw C-order regroup (B, P, 768) → (B, 12, P, 64)
    # (reference models/bert_model.py:411): plain reshape, not per-token head
    # split — kept for checkpoint compatibility.
    key = key.reshape(L, b, num_heads, p_slots, head_dim)
    value = value.reshape(L, b, num_heads, p_slots, head_dim)
    return jnp.stack([key, value], axis=1), encoded_main


def anp_kl_loss(params: Dict, encoded_main: jnp.ndarray,
                encoded_aux: Optional[jnp.ndarray], imagelabel: jnp.ndarray,
                *, rng=None, dropout_rate: float = 0.2,
                include_aux: bool = True):
    """VAO adjective-noun-pair supervision (reference
    models/bert_model.py:549-563): KL(softmax(cls(mean(prefix))) || label)
    with 'batchmean' reduction, for the main image and each aux crop.
    """
    def kl_batchmean(log_probs, target):
        # torch KLDivLoss: sum target*(log target − log_probs) / batch,
        # with 0·log0 = 0 (xlogy semantics).
        elt = jax.scipy.special.xlogy(target, target) - target * log_probs
        return elt.sum() / target.shape[0]

    rngs = [None] * 4 if rng is None else list(jax.random.split(rng, 4))
    dtype = encoded_main.dtype
    if dtype != jnp.float32:
        # One half-width HBM read of the large (6144, num_anp) kernels.
        params = {**params,
                  "img_classifier": jax.tree.map(
                      lambda x: x.astype(dtype), params["img_classifier"]),
                  "aux_img_classifiers": jax.tree.map(
                      lambda x: x.astype(dtype),
                      params.get("aux_img_classifiers", {}))}
    pooled = encoded_main.mean(axis=1)                         # (B, 6144)
    pooled = dropout(pooled, dropout_rate, rngs[0])
    logits = dense(params["img_classifier"], pooled)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    main_loss = kl_batchmean(log_probs, imagelabel.astype(jnp.float32))

    aux_losses = []
    if include_aux and encoded_aux is not None:
        a = encoded_aux.shape[1]
        for i in range(a):
            pooled_i = encoded_aux[:, i].mean(axis=1)
            pooled_i = dropout(pooled_i, dropout_rate, rngs[1 + i])
            cls_i = jax.tree.map(lambda x: x[i], params["aux_img_classifiers"])
            lp = jax.nn.log_softmax(
                dense(cls_i, pooled_i).astype(jnp.float32), axis=-1)
            aux_losses.append(kl_batchmean(lp, imagelabel.astype(jnp.float32)))
    return main_loss, aux_losses
