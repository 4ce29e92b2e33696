"""A/B the total cost of train-time dropout on the flagship step (TPU).

Variants (argv[1]):
  on   — shipped default (bernoulli masks at 3 sites/layer + embeddings;
         hardware rbg PRNG — configure_tpu_defaults switched the default
         impl off threefry back in round 1, +6%)
  off  — rng=None: every dropout is the identity (--deterministic mode)

Measured (v5e-1, b32 s128): on 945.9 ex/s (33.83 ms) vs off 990.8
(32.3 ms) — dropout's irreducible mask-generate+apply cost is ~1.5 ms/step
(4.7%) WITH rbg already enabled; there is no cheap RNG win left here
(~200M mask elements/step are simply real elementwise work).  Each
variant is its own process/compile; prints one JSON line.  Diagnostic
tool — not a bench artifact.
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
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg,
                               attention_impl=select_attention_impl(cfg, True))
    train_step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    batch = _batch(cfg, bert_cfg, b=BATCH, s=SEQ)
    rng = jax.random.PRNGKey(0)

    def step_rng():
        nonlocal rng
        if variant == "off":
            return None
        rng, srng = jax.random.split(rng)
        return srng

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch, step_rng())
    float(metrics["loss"])

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = train_step(state, batch, step_rng())
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)

    print(json.dumps({"variant": variant,
                      "ex_s": round(STEPS * BATCH / best, 1),
                      "step_ms": round(best / STEPS * 1e3, 2)}))


if __name__ == "__main__":
    main(sys.argv[1])
