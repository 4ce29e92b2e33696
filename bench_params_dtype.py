"""A/B bf16 live params + fp32 master (--params_bf16) on the flagship step.

Usage: python bench_params_dtype.py {{fp32|bf16}} [accum_steps]

Variants (argv[1]):
  fp32  — fp32 live params (shipped default)
  bf16  — bf16 live params, fp32 master in the optimizer state

argv[2] (default 1) sets gradient_accumulation_steps at CONSTANT global
batch (32): DESIGN.md §9 predicts the bf16 variant pays only at accum>1 —
each micro fwd+bwd reads half the parameter bytes while the master→bf16
cast amortizes over the micro-steps.  Each variant is its own
process/compile; prints one JSON line.  Diagnostic tool — not a bench
artifact.
"""

from __future__ import annotations

import json
import sys
import time

BATCH, SEQ = 32, 128
WARMUP, STEPS, REPEATS = 5, 50, 3


def main(variant: str, accum: int = 1):
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
    loss_fn = make_crf_loss_fn(cfg, bert_cfg,
                               attention_impl=select_attention_impl(cfg, True))
    train_step = make_train_step(loss_fn, optimizer, accum_steps=accum)
    state = create_train_state(
        params, optimizer,
        params_dtype=jnp.bfloat16 if variant == "bf16" else None)
    batch = _batch(cfg, bert_cfg, b=BATCH, s=SEQ)
    if accum > 1:
        batch = {k: v.reshape((accum, BATCH // accum) + v.shape[1:])
                 for k, v in batch.items()}
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

    print(json.dumps({"variant": variant, "accum": accum,
                      "loss": float(metrics["loss"]),
                      "ex_s": round(STEPS * BATCH / best, 1),
                      "step_ms": round(best / STEPS * 1e3, 2)}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
