"""BERT / RoBERTa encoder with visual prefix-KV support, TPU-native.

Reproduces the three deliberate reference edits to HF modeling (SURVEY.md C6):
  1. ``past_key_values_length`` forced to 0 — the visual prefix never shifts
     position ids (reference models/modeling_bert.py:1049-1050).
  2. Prefix KV concatenated to keys/values inside self-attention
     (reference models/modeling_bert.py:282-286).
  3. Embedding/encoder split for embedding-space augmentation
     (reference models/modeling_bert.py:1117-1157).

TPU-first design: the 12 layers run under a single ``lax.scan`` over stacked
layer parameters (fast compile, one fused layer program); per-layer prefix
KVs ride the scan as xs with shape ``(L, B, H, P, Dh)``.  The softmax
attention core is pluggable so the Pallas fused kernel
(:mod:`mtvaf_tpu.kernels.prefix_attention`) can swap in for the XLA lowering.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .layers import (dense, dense_init, dropout, embedding_init,
                     embedding_lookup, gelu, layer_norm, layer_norm_init,
                     mask_to_bias)


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    is_roberta: bool = False
    pad_token_id: int = 0          # roberta: 1
    remat: bool = False            # checkpoint each encoder layer: backward
                                   # recomputes activations instead of
                                   # stashing them (trade FLOPs for HBM —
                                   # for larger backbones / long context)
    selective_remat: bool = True   # checkpoint ONLY the XLA attention
                                   # core: the fp32 probs stash (scan-
                                   # stacked to (L,B,H,S,T) in HBM) costs
                                   # more to read back than the scores+
                                   # softmax recompute (+2.9% step on TPU,
                                   # measured b32 s128).  Same math, same
                                   # dropout mask (the replay reuses the
                                   # rng).  An MLP-block checkpoint was
                                   # ALSO tried and regresses 7% — the FFN
                                   # stash traffic is cheaper than the lost
                                   # up-proj epilogue fusion; the gelu
                                   # custom VJP in nn/layers.py cuts those
                                   # stashes without recompute instead.
                                   # Subsumed by ``remat``.

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def base(is_roberta: bool = False) -> "BertConfig":
        if is_roberta:
            return BertConfig(vocab_size=50265, max_position_embeddings=514,
                              type_vocab_size=1, is_roberta=True, pad_token_id=1)
        return BertConfig()

    @staticmethod
    def from_hf_dir(path: str, is_roberta: bool = False) -> "BertConfig":
        """Build from a local HF checkpoint's ``config.json`` so any
        architecture size (base/large/custom) loads correctly — the
        reference gets this via ``from_pretrained`` (models/bert_model.py:
        200-207); falls back to :meth:`base` when no config file exists."""
        import json
        import os
        p = os.path.join(path, "config.json")
        if not os.path.isfile(p):
            return BertConfig.base(is_roberta)
        with open(p) as f:
            d = json.load(f)
        is_roberta = is_roberta or d.get("model_type") == "roberta"
        base = BertConfig.base(is_roberta)
        keys = ("vocab_size", "hidden_size", "num_hidden_layers",
                "num_attention_heads", "intermediate_size",
                "max_position_embeddings", "type_vocab_size",
                "hidden_dropout_prob", "attention_probs_dropout_prob",
                "layer_norm_eps", "initializer_range", "pad_token_id")
        import dataclasses
        return dataclasses.replace(
            base, **{k: d[k] for k in keys if k in d})

    @staticmethod
    def tiny(is_roberta: bool = False, **kw) -> "BertConfig":
        """Small config for tests."""
        base = dict(vocab_size=99, hidden_size=32, num_hidden_layers=4,
                    num_attention_heads=4, intermediate_size=37,
                    max_position_embeddings=64)
        if is_roberta:
            base.update(type_vocab_size=1, is_roberta=True, pad_token_id=1,
                        max_position_embeddings=66)
        base.update(kw)
        return BertConfig(**base)


# ---------------------------------------------------------------------------
# Init.


def _layer_init(rng, cfg: BertConfig):
    ks = jax.random.split(rng, 6)
    h, i = cfg.hidden_size, cfg.intermediate_size
    sd = cfg.initializer_range
    d = partial(dense_init, stddev=sd)
    return {
        "attn": {
            # Q, K, V fused into one (h, 3h) projection: one MXU matmul per
            # layer instead of three (the math is identical; the converter
            # concatenates HF's separate q/k/v kernels).
            "qkv": d(ks[0], h, 3 * h),
            "out": d(ks[3], h, h), "ln": layer_norm_init(h),
        },
        "mlp": {
            "in": d(ks[4], h, i), "out": d(ks[5], i, h),
            "ln": layer_norm_init(h),
        },
    }


def init_bert_params(rng, cfg: BertConfig):
    ks = jax.random.split(rng, cfg.num_hidden_layers + 5)
    layers = [_layer_init(ks[i], cfg) for i in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embeddings": {
            # HF _init_weights zeroes the padding_idx row; with the
            # pad-position stop_gradient in bert_embeddings it stays zero.
            "word": embedding_init(ks[-5], cfg.vocab_size, cfg.hidden_size,
                                   stddev=cfg.initializer_range
                                   ).at[cfg.pad_token_id].set(0.0),
            "position": embedding_init(ks[-4], cfg.max_position_embeddings,
                                       cfg.hidden_size, stddev=cfg.initializer_range),
            "token_type": embedding_init(ks[-3], cfg.type_vocab_size,
                                         cfg.hidden_size, stddev=cfg.initializer_range),
            "ln": layer_norm_init(cfg.hidden_size),
        },
        "layers": stacked,
        "pooler": dense_init(ks[-2], cfg.hidden_size, cfg.hidden_size,
                             stddev=cfg.initializer_range),
    }


# ---------------------------------------------------------------------------
# Forward.


def roberta_position_ids(input_ids, pad_token_id: int):
    """RoBERTa position ids from input ids: positions count non-pad tokens and
    offset by padding_idx (reference models/modeling_roberta.py:1706-1718)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def xla_attention(q, k, v, bias, *, dropout_rate=0.0, rng=None):
    """Reference softmax attention; XLA fuses this well at these sizes.

    q: (B, H, S, Dh), k/v: (B, H, T, Dh), bias: broadcastable (B, 1|H, 1|S, T).
    """
    depth = q.shape[-1]
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k) / math.sqrt(depth)
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    probs = dropout(probs, dropout_rate, rng)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


def _xla_attention_body(q, k, v, bias, rate, rng):
    return xla_attention(q, k, v, bias, dropout_rate=rate, rng=rng)


# Rematerialized attention core: the backward recomputes scores/softmax from
# q/k/v instead of stashing the (B, H, S, T) probs (which the scan would
# otherwise stack to (L, B, H, S, T) — in fp32 — in HBM).  Only used for the
# XLA lowering; the Pallas kernel's custom VJP already recomputes.
_xla_attention_ckpt = jax.checkpoint(_xla_attention_body, static_argnums=(4,))


def _split_heads(x, num_heads):
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, nh, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, nh * dh)


def bert_layer(lp, hidden, bias, cfg: BertConfig, prefix_kv=None, rng=None,
               attention_impl=xla_attention):
    """One post-LN transformer layer with optional prefix KV.

    prefix_kv: optional (2, B, H, P, Dh) stacked (key, value) prepended to this
    layer's keys/values (reference models/modeling_bert.py:282-286).
    """
    rngs = [None] * 3 if rng is None else list(jax.random.split(rng, 3))

    qkv = dense(lp["attn"]["qkv"], hidden)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, cfg.num_attention_heads)
    k = _split_heads(k, cfg.num_attention_heads)
    v = _split_heads(v, cfg.num_attention_heads)
    if prefix_kv is not None:
        pk, pv = prefix_kv[0].astype(k.dtype), prefix_kv[1].astype(v.dtype)
        k = jnp.concatenate([pk, k], axis=2)
        v = jnp.concatenate([pv, v], axis=2)

    sel_remat = cfg.selective_remat and not cfg.remat
    impl = attention_impl
    resolve = getattr(attention_impl, "resolve", None)
    if resolve is not None:    # adaptive dispatch: see which core will run
        impl = resolve(q.shape, k.shape, ckpt_core=sel_remat)
    if sel_remat and impl is xla_attention:
        ctx = _xla_attention_ckpt(q, k, v, bias,
                                  cfg.attention_probs_dropout_prob, rngs[0])
    else:
        ctx = impl(q, k, v, bias,
                   dropout_rate=cfg.attention_probs_dropout_prob,
                   rng=rngs[0])
    attn_out = dense(lp["attn"]["out"], _merge_heads(ctx))
    attn_out = dropout(attn_out, cfg.hidden_dropout_prob, rngs[1])
    hidden = layer_norm(lp["attn"]["ln"], hidden + attn_out,
                        eps=cfg.layer_norm_eps)

    mlp = gelu(dense(lp["mlp"]["in"], hidden))
    mlp = dense(lp["mlp"]["out"], mlp)
    mlp = dropout(mlp, cfg.hidden_dropout_prob, rngs[2])
    return layer_norm(lp["mlp"]["ln"], hidden + mlp, eps=cfg.layer_norm_eps)


def bert_embeddings(params, cfg: BertConfig, input_ids, token_type_ids=None,
                    position_ids=None, rng=None, dtype=jnp.float32):
    """Embedding sum + LN + dropout.  Position ids never account for the
    prefix (reference models/modeling_bert.py:1049-1050)."""
    emb = params["embeddings"]
    b, s = input_ids.shape
    if position_ids is None:
        if cfg.is_roberta:
            position_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
        else:
            position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, s), jnp.int32)
    # torch nn.Embedding(padding_idx=pad) zeroes d loss/d table[pad] — the
    # reference's pad row is zero at init and NEVER moves even though pad
    # positions feed the encoder (and, in the span model, the unmasked
    # distant-CE softmax).  Replicate by cutting the gradient at pad
    # positions: forward unchanged, backward scatter-adds zeros into the
    # row.  RoBERTa's position table has padding_idx too (pad positions get
    # position_id == pad_token_id from roberta_position_ids).
    pad = (input_ids == cfg.pad_token_id)[..., None]
    word = embedding_lookup(emb["word"], input_ids, dtype)
    word = jnp.where(pad, jax.lax.stop_gradient(word), word)
    pos = embedding_lookup(emb["position"], position_ids, dtype)
    if cfg.is_roberta:
        pos = jnp.where(pad, jax.lax.stop_gradient(pos), pos)
    x = (word + pos
         + embedding_lookup(emb["token_type"], token_type_ids, dtype))
    x = layer_norm(emb["ln"], x, eps=cfg.layer_norm_eps)
    return dropout(x, cfg.hidden_dropout_prob, rng)


def bert_encoder(params, cfg: BertConfig, embedding_output, attention_mask,
                 prefix_kvs=None, rng=None, attention_impl=xla_attention,
                 capture_layer=None, collect_all_hidden=False):
    """Encoder stack under lax.scan.

    attention_mask: (B, P+S) when prefix_kvs given, else (B, S) — the caller
    prepends the ones-mask for the prefix (reference models/bert_model.py:257-259).
    prefix_kvs: optional (L, 2, B, H, P, Dh).

    ``capture_layer``: optionally capture ONE intermediate hidden state
    (index k in the reference's hidden_states list, where 0 = embeddings) via
    the scan carry — the probe only ever reads layer 7, and stacking all L+1
    states writes ~150 MB/step to HBM for nothing.  ``collect_all_hidden``
    restores the full (L+1, B, S, H) stack (tests/parity).

    Returns (last_hidden, all_hidden or None, captured or None).
    """
    bias = mask_to_bias(attention_mask)
    L = cfg.num_hidden_layers

    # Pre-cast the big matmul weights to the activation dtype once, outside
    # the scan: halves the per-layer weight HBM reads when training in bf16
    # (dense() would cast the fp32 master weights inside every layer body
    # otherwise; measured 788 → 815 ex/s on the flagship).  LN params stay
    # fp32 (layer_norm computes in fp32 regardless).
    dtype = embedding_output.dtype
    if dtype != jnp.float32:
        lp = params["layers"]
        cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
        params = {**params, "layers": {
            "attn": {"qkv": cast(lp["attn"]["qkv"]),
                     "out": cast(lp["attn"]["out"]),
                     "ln": lp["attn"]["ln"]},
            "mlp": {"in": cast(lp["mlp"]["in"]),
                    "out": cast(lp["mlp"]["out"]),
                    "ln": lp["mlp"]["ln"]},
        }}

    if rng is None:
        layer_rngs = None
    else:
        layer_rngs = jax.random.split(rng, L)

    capture0 = None
    if capture_layer is not None:
        capture0 = embedding_output if capture_layer == 0 \
            else jnp.zeros_like(embedding_output)

    def body(carry, xs):
        hidden, captured = carry
        layer_idx, lp, pkv, lrng = xs
        new_hidden = bert_layer(lp, hidden, bias, cfg, prefix_kv=pkv, rng=lrng,
                                attention_impl=attention_impl)
        if captured is not None:
            # hidden_states[k] for k >= 1 is the output of layer k (1-based);
            # layer_idx is 0-based, so capture after layer capture_layer - 1.
            captured = jnp.where(layer_idx == capture_layer - 1, new_hidden,
                                 captured)
        ys = new_hidden if collect_all_hidden else None
        return (new_hidden, captured), ys

    if cfg.remat:
        # checkpoint per layer: the scan backward recomputes each layer's
        # activations from its carry instead of stashing them in HBM
        # (same math; trades ~1/3 more FLOPs for O(layers) less memory)
        body = jax.checkpoint(body)

    idxs = jnp.arange(L)
    xs = (idxs, params["layers"], prefix_kvs, layer_rngs)
    if prefix_kvs is None and layer_rngs is None:
        (last, captured), hs = jax.lax.scan(
            lambda c, x: body(c, (x[0], x[1], None, None)),
            (embedding_output, capture0), (idxs, params["layers"]))
    elif prefix_kvs is None:
        (last, captured), hs = jax.lax.scan(
            lambda c, x: body(c, (x[0], x[1], None, x[2])),
            (embedding_output, capture0),
            (idxs, params["layers"], layer_rngs))
    elif layer_rngs is None:
        (last, captured), hs = jax.lax.scan(
            lambda c, x: body(c, (x[0], x[1], x[2], None)),
            (embedding_output, capture0),
            (idxs, params["layers"], prefix_kvs))
    else:
        (last, captured), hs = jax.lax.scan(body, (embedding_output, capture0),
                                            xs)

    all_hidden = None
    if collect_all_hidden:
        all_hidden = jnp.concatenate([embedding_output[None], hs], axis=0)
    return last, all_hidden, captured


def bert_pooler(params, last_hidden):
    return jnp.tanh(dense(params["pooler"], last_hidden[:, 0]))


def bert_model(params, cfg: BertConfig, input_ids, attention_mask=None,
               token_type_ids=None, prefix_kvs=None, rng=None,
               dtype=jnp.float32, attention_impl=xla_attention,
               capture_layer=None, collect_all_hidden=False):
    """Full model: embeddings → encoder → pooler.

    ``attention_mask`` here is the *prompt* attention mask: (B, P+S) when a
    prefix is attached, (B, S) otherwise.
    Returns dict(last_hidden_state, hidden_states, pooler_output,
    captured_hidden) — hidden_states only with ``collect_all_hidden``,
    captured_hidden only with ``capture_layer`` (see bert_encoder).
    """
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    emb_rng, enc_rng = (None, None) if rng is None else jax.random.split(rng)
    x = bert_embeddings(params, cfg, input_ids, token_type_ids, rng=emb_rng,
                        dtype=dtype)
    last, all_hidden, captured = bert_encoder(
        params, cfg, x, attention_mask, prefix_kvs=prefix_kvs, rng=enc_rng,
        attention_impl=attention_impl, capture_layer=capture_layer,
        collect_all_hidden=collect_all_hidden)
    return {
        "last_hidden_state": last,
        "hidden_states": all_hidden,
        "captured_hidden": captured,
        "pooler_output": bert_pooler(params, last),
    }


def get_embedding_output(params, cfg: BertConfig, input_ids,
                         token_type_ids=None, rng=None, dtype=jnp.float32):
    """Embedding half of the split forward (reference
    models/modeling_bert.py:1117-1125) for cutoff augmentation."""
    return bert_embeddings(params, cfg, input_ids, token_type_ids, rng=rng,
                           dtype=dtype)


def get_bert_output(params, cfg: BertConfig, embedding_output, attention_mask,
                    prefix_kvs=None, rng=None, attention_impl=xla_attention,
                    capture_layer=None, collect_all_hidden=False):
    """Encoder half of the split forward (reference
    models/modeling_bert.py:1127-1157)."""
    last, all_hidden, captured = bert_encoder(
        params, cfg, embedding_output, attention_mask, prefix_kvs=prefix_kvs,
        rng=rng, attention_impl=attention_impl, capture_layer=capture_layer,
        collect_all_hidden=collect_all_hidden)
    return {
        "last_hidden_state": last,
        "hidden_states": all_hidden,
        "captured_hidden": captured,
        "pooler_output": bert_pooler(params, last),
    }
