"""A/B the selective-remat pieces on the flagship step (TPU).

Variants (argv[1]):
  off     — selective_remat=False (round-2 fully-stashed backward)
  attn    — XLA-attention-core checkpoint (shipped default)
  nogelu  — default attention ckpt, but gelu custom VJP patched back to
            plain autodiff (isolates the gelu-stash saving)

Historical TPU data (b32 s128 flagship, pre-gelu-VJP): off 877.5,
attn 902.6, mlp-block-ckpt 818.2, both 842.5 ex/s — the MLP checkpoint
regresses (lost up-proj epilogue fusion) and was removed.

Each variant is its own process/compile; prints one JSON line.
Diagnostic tool for tuning nn/bert.py's selective remat — not a bench
artifact.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

BATCH, SEQ = 32, 128
WARMUP, STEPS, REPEATS = 5, 50, 3


def main(variant: str):
    import jax

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    from mtvaf_tpu.nn import bert

    if variant == "nogelu":
        # restore plain-autodiff gelu on the name bert_layer actually calls
        bert.gelu = lambda x: jax.nn.gelu(x, approximate=False)

    from __graft_entry__ import _batch, _flagship
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    cfg, bert_cfg, params = _flagship()
    if variant == "off":
        bert_cfg = dataclasses.replace(bert_cfg, selective_remat=False)
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg,
                               attention_impl=select_attention_impl(cfg, True))
    train_step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    batch = _batch(cfg, bert_cfg, b=BATCH, s=SEQ)
    rng = jax.random.PRNGKey(0)

    for _ in range(WARMUP):
        rng, srng = jax.random.split(rng)
        state, metrics = train_step(state, batch, srng)
    float(metrics["loss"])

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            rng, srng = jax.random.split(rng)
            state, metrics = train_step(state, batch, srng)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)

    print(json.dumps({"variant": variant,
                      "ex_s": round(STEPS * BATCH / best, 1),
                      "step_ms": round(best / STEPS * 1e3, 2)}))


if __name__ == "__main__":
    main(sys.argv[1])
