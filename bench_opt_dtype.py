"""A/B bf16 first-moment storage (optax mu_dtype) on the flagship step.

Usage: python bench_opt_dtype.py {fp32|mu16}

``--optimizer_mu_bf16`` is the SHIPPED default (Config); this measures
what it is worth against true fp32 first moments.  The first moment is
the most rounding-tolerant tensor in the update; storing it bf16 halves
its read+write (~440 MB/step at BERT-base+heads scale).  Each variant is
its own process/compile; prints one JSON line.  Diagnostic tool — not a
bench artifact.
"""

from __future__ import annotations

import json
import sys
import time

BATCH, SEQ = 32, 128
WARMUP, STEPS, REPEATS = 5, 50, 3


def main(variant: str):
    import jax

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    from __graft_entry__ import _batch, _flagship
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    cfg, bert_cfg, params = _flagship()
    cfg = cfg.replace(optimizer_mu_bf16=variant == "mu16")
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

    print(json.dumps({"variant": variant, "loss": float(metrics["loss"]),
                      "ex_s": round(STEPS * BATCH / best, 1),
                      "step_ms": round(best / STEPS * 1e3, 2)}))


if __name__ == "__main__":
    main(sys.argv[1])
