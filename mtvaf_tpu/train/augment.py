"""Cutoff augmentation + consistency losses (SURVEY.md C14).

Reference (modules/augument.py:54-160): re-encode with embedding-space
cutoffs — ``span_cutoff`` zeroes a random contiguous slice of embeddings and
mask, ``token_cutoff`` zeroes random token rows, ``dim_cutoff`` zeroes random
embedding dims — then add CE + Jensen-Shannon consistency on the logits
(modules/train.py:523-538).

TPU-first: the reference builds cutoffs with per-example Python loops and
dynamic slices; here every variant is a static-shape mask multiplication
(iota-range masks), fully inside the jit graph.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def span_cutoff(embeds, mask, rng, ratio: float):
    """Zero a random contiguous ratio·len slice of embeddings + mask."""
    b, s, _ = embeds.shape
    lens = mask.astype(jnp.float32).sum(axis=1)               # (B,)
    cut_len = jnp.floor(lens * ratio)                         # (B,)
    u = jax.random.uniform(rng, (b,))
    start = jnp.floor(u * (lens - cut_len))                   # (B,)
    pos = jnp.arange(s, dtype=jnp.float32)[None, :]           # (1,S)
    in_cut = (pos >= start[:, None]) & (pos < (start + cut_len)[:, None])
    keep = 1.0 - in_cut.astype(embeds.dtype)
    return embeds * keep[:, :, None], (mask * keep.astype(mask.dtype))


def token_cutoff(embeds, mask, rng, ratio: float):
    """Zero int(len·ratio) random token rows (duplicates allowed, as in the
    reference's randint draws)."""
    b, s, _ = embeds.shape
    lens = mask.astype(jnp.float32).sum(axis=1)
    count = jnp.floor(lens * ratio).astype(jnp.int32)         # (B,)
    max_k = max(int(s * ratio), 1)
    u = jax.random.uniform(rng, (b, max_k))
    draw = jnp.floor(u * lens[:, None]).astype(jnp.int32)     # (B, K) in [0,len)
    active = jnp.arange(max_k)[None, :] < count[:, None]      # (B, K)
    # scatter zeros: keep[b, t] = 0 if any active draw equals t
    hits = (draw[:, :, None] == jnp.arange(s)[None, None, :]) & \
        active[:, :, None]
    keep = 1.0 - hits.any(axis=1).astype(embeds.dtype)        # (B, S)
    return embeds * keep[:, :, None], (mask * keep.astype(mask.dtype))


def dim_cutoff(embeds, mask, rng, ratio: float):
    """Zero int(dim·ratio) random embedding dims (mask unchanged)."""
    b, s, d = embeds.shape
    count = int(d * ratio)
    draw = jax.random.randint(rng, (b, max(count, 1)), 0, d)
    hits = (draw[:, :, None] == jnp.arange(d)[None, None, :])
    if count == 0:
        keep = jnp.ones((b, d), embeds.dtype)
    else:
        keep = 1.0 - hits.any(axis=1).astype(embeds.dtype)    # (B, D)
    return embeds * keep[:, None, :], mask


CUTOFFS = {"span_cutoff": span_cutoff, "token_cutoff": token_cutoff,
           "dim_cutoff": dim_cutoff}


def make_cutoff_fn(aug_type: str, ratio: float) -> Callable:
    if aug_type not in CUTOFFS:
        raise ValueError(f"unknown aug_type {aug_type!r}")
    fn = CUTOFFS[aug_type]
    return lambda embeds, mask, rng: fn(embeds, mask, rng, ratio)


def kl_batchmean(target, x_log):
    """torch F.kl_div(input=x_log, target, reduction='batchmean')."""
    elt = jax.scipy.special.xlogy(target, target) - target * x_log
    return elt.sum() / target.shape[0]


def js_div(p, q):
    """Reference js_div (modules/train.py:533-538): mean of KL(m‖p), KL(m‖q)
    with m = (p+q)/2 (note the reversed-argument torch.kl_div convention)."""
    m = (p + q) / 2
    a = kl_batchmean(m, jnp.log(p))
    b = kl_batchmean(m, jnp.log(q))
    return (a + b) / 2


def make_span_augment_fn(cfg, bert_cfg, attention_impl):
    """Consistency-augmented loss for the span pipeline
    (reference modules/train.py:435-455 + cal_cut_loss :523-538)."""
    from ..nn.models import span_model_loss

    cutoff = make_cutoff_fn(cfg.aug_type, cfg.aug_cutoff_ratio)
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

    def augment_fn(params, batch, rng, base_loss, base_metrics):
        cut_rng, fwd_rng = jax.random.split(rng)
        out = span_model_loss(
            params, cfg, bert_cfg, batch,
            visual_guides=(batch["main_guides"], batch.get("aux_guides"))
            if "main_guides" in batch else None,
            rng=fwd_rng, attention_impl=attention_impl, dtype=dtype,
            cutoff=(cutoff, cut_rng))
        loss = base_loss
        if cfg.aug_ce_loss > 0:
            loss = loss + cfg.aug_ce_loss * out["loss"]
        if cfg.aug_js_loss > 0:
            # Reference softmaxes the (B, M, 4) span logits over the span dim
            # (modules/train.py:527-528 dim=1) — kept as-is.
            p = jax.nn.softmax(base_metrics["ac_logits"] + 1e-10, axis=1)
            q = jax.nn.softmax(out["ac_logits"] + 1e-10, axis=1)
            loss = loss + cfg.aug_js_loss * js_div(p, q)
        metrics = dict(base_metrics)
        metrics["loss"] = loss
        metrics["cutoff_loss"] = out["loss"]
        return loss, metrics

    return augment_fn
