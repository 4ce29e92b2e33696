"""Benchmark: flagship train-step throughput on the attached TPU chip.

Measures steady-state training examples/sec/chip for the full MTVAF
configuration (BERT-base + 16-slot visual prefix + CRF + ANP + probe losses,
batch 32, seq 128) with frozen-ResNet guides cached (they are computed once
per image per dataset; see mtvaf_tpu/train/trainer_*.GuideCache).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline uses REFERENCE_EST_EXAMPLES_PER_SEC — an *estimate* of the
PyTorch reference's single-GPU throughput (V100-class): per step the
reference runs 2 full BERT-base forwards + 1 backward plus 8 ResNet-152
224² forwards (4 images × 2 calls — modules/train.py:341,
models/bert_model.py:256) and a host logits sync; the ResNet work alone
(~8 × 11.5 GFLOPs/image) caps it near ~25 ex/s.  The reference repo
publishes no numbers (BASELINE.md) so this stands in until a GPU
measurement exists.
"""

from __future__ import annotations

import json
import time

REFERENCE_EST_EXAMPLES_PER_SEC = 25.0
BATCH = 32
SEQ = 128
WARMUP_STEPS = 5
MEASURE_STEPS = 50
REPEATS = 3   # report the best window: noise (tunnel RPC jitter, host
              # contention) is one-sided — it only ever slows a window


def main():
    import jax

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    from __graft_entry__ import _batch, _flagship
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl

    cfg, bert_cfg, params = _flagship()
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg,
                               attention_impl=select_attention_impl(cfg, True))
    train_step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)

    batch = _batch(cfg, bert_cfg, b=BATCH, s=SEQ)
    rng = jax.random.PRNGKey(0)

    for _ in range(WARMUP_STEPS):
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch, step_rng)
    float(metrics["loss"])   # host fetch — forces completion (block_until_ready
    # alone can return early through the axon tunnel)

    best_dt = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
        float(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    ex_per_sec = MEASURE_STEPS * BATCH / best_dt
    from mtvaf_tpu.core.flops import mfu_fields
    out = {
        "metric": "train_examples_per_sec_per_chip",
        "value": round(ex_per_sec, 2),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_sec / REFERENCE_EST_EXAMPLES_PER_SEC, 2),
    }
    # achieved TFLOP/s + % of chip bf16 peak (static model FLOPs): makes
    # utilization regressions visible independently of batch/seq choices
    out.update(mfu_fields(bert_cfg, SEQ, ex_per_sec,
                          prefix_len=16 if cfg.use_prefix else 0))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
