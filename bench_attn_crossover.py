"""Re-measure the adaptive_attention crossover now that the XLA core is
checkpointed (selective_remat): the fp32 probs stash that made Pallas win
at large B·S·T no longer exists, so the dispatch threshold set in round 3
(_PALLAS_MIN_STASH on stash volume) may be stale.

Runs the flagship step at (b, s=128) with the attention core FORCED to
xla (checkpointed) or pallas; prints one JSON line per cell.

Usage: python bench_attn_crossover.py <batch> <xla|pallas>
"""

from __future__ import annotations

import json
import sys
import time

SEQ = 128
WARMUP, STEPS, REPEATS = 5, 30, 3


def main(b: int, which: str):
    import jax

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    from __graft_entry__ import _batch, _flagship
    from mtvaf_tpu.kernels.prefix_attention import prefix_flash_attention
    from mtvaf_tpu.nn.bert import xla_attention
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    impl = {"xla": xla_attention, "pallas": prefix_flash_attention}[which]
    cfg, bert_cfg, params = _flagship()
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg, attention_impl=impl)
    train_step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    batch = _batch(cfg, bert_cfg, b=b, s=SEQ)
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

    print(json.dumps({"batch": b, "impl": which,
                      "ex_s": round(STEPS * b / best, 1),
                      "step_ms": round(best / STEPS * 1e3, 2)}))


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
