"""Full models: span ABSA (pipeline A) and CRF tagging (pipeline B).

TPU-native re-design of ``TVNetSAModel`` / ``TVNetSAModel2``
(reference models/bert_model.py:192-414, 416-588):

* one jitted forward/backward per training step — train-mode span candidates
  are precomputed in the data pipeline (SURVEY.md §7.1), visual guides for the
  frozen ResNet are cacheable, and the probe's pseudo-labels are built on
  device;
* static shapes everywhere: spans gather ``max_answer_length`` tokens
  (masked), candidates are padded to ``n_best_size``;
* the visual branch consumes precomputed stage guides (B, 4, C) so the
  ResNet runs once per image instead of twice per step as in the reference
  (modules/train.py:341 + models/bert_model.py:256).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .bert import BertConfig, bert_model, xla_attention
from .crf import (crf_decode, crf_decode_parallel, crf_loss,
                  init_crf_params)
from .layers import dense, dense_init, dropout
from .prefix import anp_kl_loss, build_prefix_kvs, encode_guides, init_prefix_params
from .probe import combine_loss, init_probe_params, probe_loss
from .resnet import resnet_stage_guides


# ---------------------------------------------------------------------------
# Shared pieces.


def distant_cross_entropy(logits, positions):
    """Distant-supervision CE over indicator vectors
    (reference models/bert_model.py:181-190)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pos = positions.astype(jnp.float32)
    per_ex = jnp.sum(pos * log_probs, axis=-1) / jnp.maximum(pos.sum(-1), 1e-9)
    return -jnp.mean(per_ex)


def get_span_representation(seq_output, span_starts, span_ends, *,
                            max_span_width: int):
    """Gather span token representations with a static width.

    Replaces the reference's dynamic flatten/cumsum gather
    (models/bert_model.py:147-170) with a per-batch static gather: positions
    beyond a span's width are masked, so the clamped reads never contribute.

    seq_output (B, S, H); span_starts/ends (B, M) → (B, M, W, H), (B, M, W).
    """
    b, s_len, h = seq_output.shape
    m = span_starts.shape[1]
    width = jnp.arange(max_span_width)[None, None, :]           # (1,1,W)
    idx = jnp.minimum(span_starts[:, :, None] + width, s_len - 1)
    # Gather with a (B, M·W, 1) broadcast index — NOT an expanded
    # (B, M, W, H) index tensor, which would materialize B·M·W·H int32s
    # (~226 MB at bench scale) and dominate the span step.
    flat = idx.reshape(b, m * max_span_width)
    span_emb = jnp.take_along_axis(seq_output, flat[..., None], axis=1)
    span_emb = span_emb.reshape(b, m, max_span_width, h)
    span_width = span_ends - span_starts + 1                    # (B, M)
    span_mask = width < span_width[:, :, None]
    return span_emb, span_mask


def self_attentive_pool(span_emb, span_score, span_mask):
    """Masked self-attentive pooling (reference models/bert_model.py:172-179)."""
    bias = (1.0 - span_mask.astype(jnp.float32)) * -10000.0
    probs = jax.nn.softmax(span_score.astype(jnp.float32) + bias, axis=-1)
    return jnp.einsum("bmw,bmwh->bmh", probs.astype(span_emb.dtype), span_emb)


# ---------------------------------------------------------------------------
# Visual branch helpers.


def image_rows_to_f32(imgs):
    """Transfer-dtype image rows → normalized fp32, dispatched at TRACE time.

    Device-side twin of the predictor's image transfer modes (infer.py
    ``image_dtype``): fp32/fp16 rows are a plain cast; uint8 rows are raw
    pixels shipped at 1/4 the fp32 bytes (data/images.denormalize_to_u8)
    and re-normalized here with the SAME expression as the host pipeline
    (data/images._normalize), so a uint8 round-trip reproduces the host
    fp32 values exactly on uint8-origin pixels.  Works for both (B,H,W,3)
    main rows and (B,A,H,W,3) aux crops (channel stats broadcast on the
    trailing axis)."""
    if imgs.dtype == jnp.uint8:
        from ..data.images import IMAGENET_MEAN, IMAGENET_STD
        x = imgs.astype(jnp.float32) / jnp.float32(255.0)
        return (x - IMAGENET_MEAN) / IMAGENET_STD
    return imgs.astype(jnp.float32)


def compute_visual_guides(resnet_params, images, aux_imgs, *, depth: int):
    """Frozen-ResNet multi-scale guides for a batch.

    images (B, 224, 224, 3); aux_imgs (B, A, 224, 224, 3) or None.
    Returns (main (B,4,C), aux (B,A,4,C) or None).  The backbone is frozen
    (reference modules/train.py:485-486) → callers may cache these per image.
    """
    main = resnet_stage_guides(resnet_params, images, depth=depth)
    aux = None
    if aux_imgs is not None:
        b, a = aux_imgs.shape[:2]
        flat = aux_imgs.reshape((b * a,) + aux_imgs.shape[2:])
        aux = resnet_stage_guides(resnet_params, flat, depth=depth)
        aux = aux.reshape(b, a, *aux.shape[1:])
    return main, aux


def visual_prompt(prefix_params, main_guides, aux_guides, bert_cfg: BertConfig):
    """Guides → per-layer prefix KVs + encoded activations for the ANP loss.

    Params are pre-cast to the guides' dtype (bf16 in training) so the large
    ANP classifier kernels are read from HBM once at half width."""
    dtype = main_guides.dtype
    if dtype != jnp.float32:
        prefix_params = jax.tree.map(lambda x: x.astype(dtype), prefix_params)
    kvs, enc_main = build_prefix_kvs(
        prefix_params, main_guides, aux_guides,
        num_heads=bert_cfg.num_attention_heads, head_dim=bert_cfg.head_dim)
    enc_aux = None
    if aux_guides is not None:
        b, a = aux_guides.shape[:2]
        enc_aux = encode_guides(
            prefix_params, aux_guides.reshape(b * a, *aux_guides.shape[2:]))
        enc_aux = enc_aux.reshape(b, a, *enc_aux.shape[1:])
    return kvs, enc_main, enc_aux


def prompt_attention_mask(input_mask, prefix_len: int):
    """Prepend the all-ones prefix mask (reference models/bert_model.py:257-259)."""
    b = input_mask.shape[0]
    ones = jnp.ones((b, prefix_len), input_mask.dtype)
    return jnp.concatenate([ones, input_mask], axis=1)


# ---------------------------------------------------------------------------
# Pipeline A: span model.


def init_span_model_params(rng, cfg, bert_cfg: BertConfig,
                           bert_params=None) -> Dict:
    from .bert import init_bert_params
    ks = jax.random.split(rng, 8)
    h = bert_cfg.hidden_size
    params = {
        "bert": bert_params if bert_params is not None
        else init_bert_params(ks[0], bert_cfg),
        "dense": dense_init(ks[1], h, h),
        "unary_affine": dense_init(ks[2], h, 1),
        "binary_affine": dense_init(ks[3], h, 2),
        "classifier": dense_init(ks[4], h, 4),
    }
    if cfg.use_prefix:
        params["prefix"] = init_prefix_params(
            ks[5], in_channels=cfg.resnet_concat_channels,
            mid_dim=cfg.prefix_dim, hidden_size=h,
            num_layers=bert_cfg.num_hidden_layers, with_anp=False)
    if cfg.use_probe:
        params["probe"] = init_probe_params(ks[6], h, cfg.probe_rank)
    if cfg.gcn_layer_number > 0:
        from .gcn import init_digcn_params
        k_gcn, k_dep = jax.random.split(ks[7])
        params["digcn"] = init_digcn_params(k_gcn, cfg.gcn_layer_number, h)
        # Dependency-type embedding (reference models/bert_model.py:235):
        # constructed with padding_idx=0 but never consumed by the reference
        # forward — kept so checkpoints/transplants line up.
        emb = jax.random.normal(k_dep, (cfg.type_num, h)) * 0.02
        params["dep_embedding"] = emb.at[0].set(0.0)
    if cfg.num_layers > 0:
        from .gcn import init_dualgcn_params
        params["dualgcn"] = init_dualgcn_params(
            ks[7], cfg.num_layers, h, bert_cfg.num_attention_heads)
    return params


def span_extraction(params, cfg, bert_cfg: BertConfig, input_ids, input_mask,
                    segment_ids, prefix_kvs=None, rng=None,
                    attention_impl=xla_attention, dtype=jnp.float32,
                    cutoff=None, capture_layer=None):
    """BERT forward → start/end logits (+ sequence output, optionally one
    captured hidden state for the probe)
    (reference models/bert_model.py:323-361).

    ``cutoff``: optional (cutoff_fn, rng) applying embedding-space
    augmentation between the embedding and encoder halves (reference
    modules/augument.py:54-76).  Deviation (documented): cutoff lengths are
    computed from the *text* mask; the reference mixes prompt-mask lengths
    into text-length indexing (modules/augument.py:63-64), which can overrun.
    """
    drop_rng, bert_rng = (None, None) if rng is None else jax.random.split(rng)
    if cutoff is not None:
        from .bert import bert_embeddings, get_bert_output
        cutoff_fn, cut_rng = cutoff
        emb_rng, enc_rng = (None, None) if bert_rng is None \
            else jax.random.split(bert_rng)
        embeds = bert_embeddings(params["bert"], bert_cfg, input_ids,
                                 segment_ids, rng=emb_rng, dtype=dtype)
        embeds, cut_mask = cutoff_fn(embeds, input_mask, cut_rng)
        mask = cut_mask if prefix_kvs is None else \
            prompt_attention_mask(cut_mask, prefix_kvs.shape[-2])
        out = get_bert_output(params["bert"], bert_cfg, embeds, mask,
                              prefix_kvs=prefix_kvs, rng=enc_rng,
                              attention_impl=attention_impl,
                              capture_layer=capture_layer)
    else:
        mask = input_mask if prefix_kvs is None else \
            prompt_attention_mask(input_mask, prefix_kvs.shape[-2])
        out = bert_model(params["bert"], bert_cfg, input_ids, mask,
                         token_type_ids=segment_ids, prefix_kvs=prefix_kvs,
                         rng=bert_rng, dtype=dtype,
                         attention_impl=attention_impl,
                         capture_layer=capture_layer)
    seq = dropout(out["last_hidden_state"], bert_cfg.hidden_dropout_prob, drop_rng)
    ae_logits = dense(params["binary_affine"], seq).astype(jnp.float32)
    start_logits, end_logits = ae_logits[..., 0], ae_logits[..., 1]
    return start_logits, end_logits, seq, out["captured_hidden"]


def span_classification(params, cfg, seq_output, span_starts, span_ends,
                        rng=None):
    """Span gather → self-attentive pool → dense/tanh → 4-way polarity logits
    (reference models/bert_model.py:363-376)."""
    span_emb, span_mask = get_span_representation(
        seq_output, span_starts, span_ends, max_span_width=cfg.max_answer_length)
    span_score = dense(params["unary_affine"], span_emb)[..., 0]  # (B,M,W)
    pooled = self_attentive_pool(span_emb, span_score, span_mask)  # (B,M,H)
    pooled = jnp.tanh(dense(params["dense"], pooled))
    pooled = dropout(pooled, 0.1, rng)
    return dense(params["classifier"], pooled).astype(jnp.float32)  # (B,M,4)


def span_model_loss(params, cfg, bert_cfg: BertConfig, batch: Dict,
                    visual_guides: Optional[Tuple] = None, rng=None,
                    attention_impl=xla_attention, dtype=jnp.float32,
                    epoch_const: Optional[int] = None, cutoff=None) -> Dict:
    """Single-forward training loss (reference runs extraction + full forward
    per step; here extraction and classification share one BERT pass).

    batch keys: input_ids, input_mask, segment_ids, start_positions,
    end_positions, span_starts, span_ends, span_labels, span_masks.
    """
    rngs = [None] * 3 if rng is None else list(jax.random.split(rng, 3))
    prefix_kvs = None
    if cfg.use_prefix and visual_guides is not None:
        main_g, aux_g = visual_guides
        main_g = main_g.astype(dtype)
        aux_g = aux_g.astype(dtype) if aux_g is not None else None
        prefix_kvs, _, _ = visual_prompt(params["prefix"], main_g, aux_g, bert_cfg)

    start_logits, end_logits, seq, captured = span_extraction(
        params, cfg, bert_cfg, batch["input_ids"], batch["input_mask"],
        batch["segment_ids"], prefix_kvs=prefix_kvs, rng=rngs[0],
        attention_impl=attention_impl, dtype=dtype, cutoff=cutoff,
        capture_layer=cfg.probe_layer if cfg.use_probe else None)
    return span_model_tail(params, cfg, bert_cfg, batch, seq, start_logits,
                           end_logits, captured=captured,
                           rngs=(rngs[1], rngs[2]), epoch_const=epoch_const)


def span_model_tail(params, cfg, bert_cfg: BertConfig, batch: Dict, seq,
                    start_logits, end_logits, captured=None,
                    rngs=(None, None), epoch_const: Optional[int] = None
                    ) -> Dict:
    """Post-encoder half of the span loss (reference
    models/bert_model.py:270-316): DiGCN re-encode, span classification,
    distant-CE + polarity-CE, optional DualGCN + probe terms.

    Shared between the train loss (above) and the eval-loss step: the
    reference's dev/test loops run the FULL forward a second time with the
    eval-branch candidates to get the logged loss (modules/train.py:197-199,
    295-305); in eval mode dropout is off, so applying this tail to the
    extraction pass's own (seq, logits, captured) is the same math without
    re-running the encoder.  ``rngs`` = (classification_rng, gcn_rng).
    """
    # Optional DiGCN re-encoding of the sequence before classification
    # (reference models/bert_model.py:270-284): first-subtoken rows are
    # compacted to the front when valid_ids is supplied, dropout applies to
    # the compacted sequence, then the directional GCN re-encodes it.
    if cfg.gcn_layer_number > 0 and "adjacency_matrix" in batch:
        from .gcn import compress_valid_ids, digcn_forward
        if "valid_ids" in batch:
            seq = compress_valid_ids(seq, batch["valid_ids"])
        seq = dropout(seq, 0.1, rngs[1])
        seq = digcn_forward(params["digcn"], seq, batch["adjacency_matrix"])

    ac_logits = span_classification(params, cfg, seq, batch["span_starts"],
                                    batch["span_ends"], rng=rngs[0])

    start_loss = distant_cross_entropy(start_logits, batch["start_positions"])
    end_loss = distant_cross_entropy(end_logits, batch["end_positions"])
    ae_loss = (start_loss + end_loss) / 2

    flat_logits = ac_logits.reshape(-1, 4)
    flat_labels = batch["span_labels"].reshape(-1)
    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, flat_labels[:, None], axis=1)[:, 0]
    if getattr(cfg, "span_ac_loss_mode", "reference") == "masked":
        m = batch["span_masks"].reshape(-1).astype(jnp.float32)
        ac_loss = jnp.sum(ce * m) / jnp.maximum(m.sum(), 1.0)
    else:
        # Reference quirk kept (models/bert_model.py:302-303):
        # nn.CrossEntropyLoss mean-reduces BEFORE the mask multiply, so
        # sum(mask * scalar)/mask.sum() cancels to the unmasked mean and
        # padded slots train toward class 0 ('other') — acting as a null
        # class for bad candidates at eval.  The cancelled factor is kept
        # because it does NOT cancel when the batch has ZERO unmasked
        # candidates: the eval branch's validity/threshold filters can
        # reject every candidate, and the reference's 0/0 then propagates
        # NaN into the logged eval loss (x/x is exactly 1.0 otherwise, so
        # this costs nothing numerically).
        m = batch["span_masks"].reshape(-1).astype(jnp.float32)
        msum = jnp.sum(m)
        ac_loss = jnp.mean(ce) * (msum / msum)

    tot_loss = ae_loss + ac_loss
    out = {"start_logits": start_logits, "end_logits": end_logits,
           "ac_logits": ac_logits, "ae_loss": ae_loss, "ac_loss": ac_loss}

    # Optional DualGCN auxiliary sentence-polarity loss + penalties
    # (reference models/bert_model.py:307-309).
    if cfg.num_layers > 0 and "adj_matrix" in batch:
        from .gcn import dualgcn_forward
        from .bert import bert_pooler
        pooled = bert_pooler(params["bert"], seq)
        gcn_logits, penal = dualgcn_forward(
            params["dualgcn"], cfg, seq, pooled, batch["adj_matrix"],
            batch["src_mask"], batch["aspect_mask"], rng=rngs[1],
            heads=bert_cfg.num_attention_heads)
        lp = jax.nn.log_softmax(gcn_logits, axis=-1)
        tat_loss = -jnp.mean(jnp.take_along_axis(
            lp, batch["polaritys"][:, None], axis=1)[:, 0])
        tot_loss = tot_loss + tat_loss + penal
        out["tat_loss"] = tat_loss
        out["penal"] = penal

    if cfg.use_probe:
        p_loss = probe_loss(params["probe"], captured)
        out["probe_loss"] = p_loss
        out["ori_loss"] = tot_loss
        tot_loss = combine_loss(tot_loss, p_loss, cfg.beta,
                                epoch_const if epoch_const is not None
                                else cfg.num_epochs)
    out["loss"] = tot_loss
    return out


# ---------------------------------------------------------------------------
# Pipeline B: CRF tagging model.


def init_crf_model_params(rng, cfg, bert_cfg: BertConfig,
                          bert_params=None) -> Dict:
    from .bert import init_bert_params
    ks = jax.random.split(rng, 6)
    h = bert_cfg.hidden_size
    num_labels = cfg.num_crf_labels
    params = {
        "bert": bert_params if bert_params is not None
        else init_bert_params(ks[0], bert_cfg),
        "fc": dense_init(ks[1], h, num_labels),
        "crf": init_crf_params(ks[2], num_labels),
    }
    if cfg.use_prefix:
        params["prefix"] = init_prefix_params(
            ks[3], in_channels=cfg.resnet_concat_channels,
            mid_dim=cfg.prefix_dim, hidden_size=h,
            num_layers=bert_cfg.num_hidden_layers, with_anp=cfg.vao,
            num_anp_classes=cfg.num_anp_classes)
    if cfg.use_probe:
        params["probe"] = init_probe_params(ks[4], h, cfg.probe_rank)
    return params


def crf_model_forward(params, cfg, bert_cfg: BertConfig, batch: Dict,
                      visual_guides: Optional[Tuple] = None, rng=None,
                      attention_impl=xla_attention, dtype=jnp.float32,
                      with_loss: bool = True, with_decode: bool = False) -> Dict:
    """TVNetSAModel2 forward (reference models/bert_model.py:480-532).

    batch keys: input_ids, input_mask, segment_ids, label_ids, imagelabel.
    """
    rngs = [None] * 3 if rng is None else list(jax.random.split(rng, 3))
    prefix_kvs, img_tag_loss = None, 0.0
    if cfg.use_prefix and visual_guides is not None:
        main_g, aux_g = visual_guides
        main_g = main_g.astype(dtype)
        aux_g = aux_g.astype(dtype) if aux_g is not None else None
        prefix_kvs, enc_main, enc_aux = visual_prompt(
            params["prefix"], main_g, aux_g, bert_cfg)
        if cfg.vao:
            main_loss, aux_losses = anp_kl_loss(
                params["prefix"], enc_main, enc_aux, batch["imagelabel"],
                rng=rngs[2])
            # noauxloss drops the aux terms (reference models/bert_model.py:489).
            img_tag_loss = main_loss if cfg.noauxloss \
                else main_loss + sum(aux_losses)

    mask = batch["input_mask"] if prefix_kvs is None else \
        prompt_attention_mask(batch["input_mask"], prefix_kvs.shape[-2])
    out = bert_model(params["bert"], bert_cfg, batch["input_ids"], mask,
                     token_type_ids=batch["segment_ids"],
                     prefix_kvs=prefix_kvs, rng=rngs[0], dtype=dtype,
                     attention_impl=attention_impl,
                     capture_layer=cfg.probe_layer if cfg.use_probe else None)
    seq = dropout(out["last_hidden_state"], 0.1, rngs[1])
    emissions = dense(params["fc"], seq).astype(jnp.float32)

    result = {"emissions": emissions}
    if with_loss:
        loss = crf_loss(params["crf"], emissions, batch["label_ids"],
                        batch["input_mask"])
        if cfg.use_probe:
            p_loss = probe_loss(params["probe"], out["captured_hidden"])
            result["probe_loss"] = p_loss
            loss = combine_loss(loss, p_loss, cfg.beta, 30)
        result["img_tag_loss"] = cfg.alpha * img_tag_loss
        result["loss"] = loss + cfg.alpha * img_tag_loss
    if with_decode:
        decode = (crf_decode_parallel
                  if getattr(cfg, "crf_decode_impl", "scan") == "parallel"
                  else crf_decode)
        tags, lengths = decode(params["crf"], emissions, batch["input_mask"])
        result["pred_tags"] = tags
        result["lengths"] = lengths
    return result
