"""Arithmetic-intensity scaling: flagship step at growing batch + width.

The 5 BASELINE configs pin the reference's batch 32 / BERT-base for parity;
this bench shows the same step's MFU as arithmetic intensity grows (bigger
batch amortizes the fixed optimizer/HBM cost; bert-large raises the
matmul/LN ratio) — i.e. where the hardware ceiling is vs the parity point.
Writes BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import time

WARMUP = 3
MEASURE = 20


def _time(step, state, batch, b):
    import jax
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    float(metrics["loss"])
    return MEASURE * b / (time.perf_counter() - t0)


def main():
    import dataclasses

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.core.flops import mfu_fields
    from mtvaf_tpu.core.platform import configure_tpu_defaults
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)
    configure_tpu_defaults()

    import jax

    from bench_configs import _crf_batch
    from mtvaf_tpu.nn.models import init_crf_model_params

    cfg = Config(dataset_name="twitter2015", use_prefix=True, use_152=True,
                 vao=True, use_probe=True)
    rows = []

    def run(name, bc, b, s=128):
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
        loss_fn = make_crf_loss_fn(cfg, bc, select_attention_impl(cfg, True))
        opt, _ = build_optimizer(params, cfg, total_steps=1000,
                                 pipeline="crf")
        step = make_train_step(loss_fn, opt)
        state = create_train_state(params, opt)
        v = _time(step, state, _crf_batch(cfg, bc, b, s), b)
        row = {"config": name, "value": round(v, 2), "unit": "examples/s"}
        row.update(mfu_fields(bc, s, v, prefix_len=16))
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = BertConfig.base()
    run("flagship_b32", base, 32)          # the parity point
    run("flagship_b64", base, 64)
    run("flagship_b128", base, 128)        # b256 exceeds 16G HBM (the XLA
                                           # train path stashes attention
                                           # probs; use --remat beyond b128)
    large = dataclasses.replace(base, hidden_size=1024, num_hidden_layers=24,
                                num_attention_heads=16,
                                intermediate_size=4096)
    run("flagship_bert_large_b32", large, 32)

    with open("BENCH_SCALING.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
