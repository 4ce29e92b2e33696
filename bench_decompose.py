"""Decompose the flagship train step's 36 ms on the attached TPU chip.

At b32 s128 the strict-matmul FLOP count predicts ~14 ms at peak; the step
measures ~36 ms.  This bench times each constituent as its OWN jitted
program (50 pipelined dispatches, fetch once — the dispatch floor is
~0.7 ms so per-step RPC cost is negligible) to locate the non-MXU time:

* full       — fused fwd+bwd+AdamW (the production step)
* grads      — value_and_grad only, grads RETURNED (no optimizer)
* fwd        — loss forward only
* adamw      — optimizer update alone on captured grads
* crf        — crf_log_likelihood fwd+bwd alone on (b, s, L) emissions
* encoder    — BERT encoder fwd+bwd alone (emission-head sum loss)
* prefix     — visual_prompt forward alone

Prints one JSON object of ms-per-step entries.
"""

from __future__ import annotations

import json
import time

B, S = 32, 128
N = 50
REPEATS = 3


def _best(fn):
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    from __graft_entry__ import _batch, _flagship
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    cfg, bert_cfg, params = _flagship()
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    attn = select_attention_impl(cfg, True)
    loss_fn = make_crf_loss_fn(cfg, bert_cfg, attention_impl=attn)
    batch = _batch(cfg, bert_cfg, b=B, s=S)
    rng = jax.random.PRNGKey(0)
    out = {}

    def timed(name, fn, *args):
        # chain-free: dispatch N, fetch one scalar probe from the last
        r = fn(*args)
        probe = jax.tree.leaves(r)[0]
        float(np.ravel(np.asarray(probe))[0]) if hasattr(probe, "shape") \
            else float(probe)

        def loop():
            r = None
            for _ in range(N):
                r = fn(*args)
            p = jax.tree.leaves(r)[0]
            np.asarray(p)
        out[name] = round(_best(loop), 2)

    import numpy as np

    # full step
    step = make_train_step(loss_fn, optimizer, donate=False)
    state = create_train_state(params, optimizer)
    timed("full", step, state, batch, rng)

    # grads only (returned!)
    gfn = jax.jit(jax.value_and_grad(
        lambda p, b, r: loss_fn(p, b, r)[0]))
    timed("grads", gfn, params, batch, rng)

    # forward only
    ffn = jax.jit(lambda p, b, r: loss_fn(p, b, r)[0])
    timed("fwd", ffn, params, batch, rng)

    # AdamW update alone
    _, grads = gfn(params, batch, rng)
    opt_state = optimizer.init(params)
    upd = jax.jit(lambda g, o, p: optimizer.update(g, o, p))
    timed("adamw", upd, grads, opt_state, params)

    # CRF alone (fwd+bwd through log-likelihood)
    from mtvaf_tpu.nn.crf import crf_log_likelihood
    L = cfg.num_crf_labels
    em = jnp.asarray(np.random.RandomState(0).randn(B, S, L), jnp.float32)
    tags = batch["label_ids"]
    mask = batch["input_mask"]
    crf_p = params["crf"]

    cfn = jax.jit(jax.value_and_grad(
        lambda cp, e: -crf_log_likelihood(cp, e, tags, mask).sum(),
        argnums=(0, 1)))
    timed("crf", cfn, crf_p, em)

    # encoder alone fwd+bwd (bf16 acts like the step)
    from mtvaf_tpu.nn.bert import bert_model
    ids, im, seg = (batch["input_ids"], batch["input_mask"],
                    batch["segment_ids"])

    def enc_loss(p):
        out = bert_model(p["bert"], bert_cfg, ids, im, seg,
                         attention_impl=attn, dtype=jnp.bfloat16)
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32) ** 2)

    efn = jax.jit(jax.value_and_grad(enc_loss))
    timed("encoder", efn, params)

    # prefix/visual forward alone
    from mtvaf_tpu.nn.models import visual_prompt
    pfn = jax.jit(lambda pp, m, a: visual_prompt(pp, m, a, bert_cfg)[0])
    timed("prefix_fwd", pfn, params["prefix"],
          batch["main_guides"], batch["aux_guides"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
