"""Long-sequence kernel bench: the s=512 rows of BENCH_ABLATE (round-3).

Measures the flagship CRF train step (dropout on) and the c2-style span
step at long sequence with the KV-chunked flash backward.  Round-2
recorded: flagship s512 202.6 ex/s, c2 s500 231 ex/s (full-matrix
backward, hb=3).  Prints one JSON line per row.
"""

from __future__ import annotations

import json
import time

WARMUP = 3
MEASURE = 10
BATCH = 32


def _time(step, state, batch, key_seed=1):
    import jax
    key = jax.random.PRNGKey(key_seed)
    for _ in range(WARMUP):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    float(metrics["loss"])
    return MEASURE * BATCH / (time.perf_counter() - t0)


def main():
    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.core.flops import mfu_fields
    from mtvaf_tpu.core.platform import configure_tpu_defaults
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_span_loss_fn, make_train_step)
    configure_tpu_defaults()

    import jax

    from bench_configs import _crf_batch, _span_batch
    from mtvaf_tpu.nn.models import (init_crf_model_params,
                                     init_span_model_params)

    rows = []

    def record(name, desc, value, bc, s, pl):
        row = {"config": name, "desc": desc, "value": round(value, 2),
               "unit": "examples/s"}
        row.update(mfu_fields(bc, s, value, prefix_len=pl))
        rows.append(row)
        print(json.dumps(row), flush=True)

    bc = BertConfig.base()

    # flagship at s=512 (prefix + vao + probe, dropout on)
    cfg = Config(dataset_name="twitter2015", use_prefix=True, use_152=True,
                 vao=True, use_probe=True)
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
    loss_fn = make_crf_loss_fn(cfg, bc, select_attention_impl(cfg, True))
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    record("flagship_s512",
           "full MTVAF CRF train step, b32 s512, flash kernel",
           _time(step, state, _crf_batch(cfg, bc, BATCH, 512)),
           bc, 512, 16)

    # bert-large at s=512 (24L/1024H/16A — the kernel's 16-head block rows:
    # fwd hb=2, bwd hb=4; parity at this geometry in
    # tests/test_pallas_attention.py::test_bert_large_geometry_matches_xla)
    import dataclasses
    # remat: 24L/1024H at s512 does not fit 16 GB HBM even at b16 without
    # checkpointed encoder layers (the documented escape hatch for larger
    # backbones at long context, docs/CONFIGS.md --remat)
    bc_l = dataclasses.replace(bc, hidden_size=1024, num_hidden_layers=24,
                               num_attention_heads=16,
                               intermediate_size=4096, remat=True)
    cfg = Config(dataset_name="twitter2015", use_prefix=True, use_152=True,
                 vao=True, use_probe=True, probe_rank=512)
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc_l)
    loss_fn = make_crf_loss_fn(cfg, bc_l, select_attention_impl(cfg, True))
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    record("flagship_bert_large_s512",
           "full MTVAF CRF train step, bert-large b32 s512, flash kernel "
           "+ --remat (OOMs 16 GB HBM without it, even at b16)",
           _time(step, state, _crf_batch(cfg, bc_l, BATCH, 512)),
           bc_l, 512, 16)
    del state, step, optimizer, params

    # c2: span + merged visual-context text, s500
    cfg = Config(dataset_name="twitter15", use_align=True)
    params = init_span_model_params(jax.random.PRNGKey(0), cfg, bc)
    loss_fn = make_span_loss_fn(cfg, bc, select_attention_impl(cfg, True))
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="span")
    step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    record("c2_align_span_s500",
           "BERT-base + merged visual-context text span step, b32 s500",
           _time(step, state, _span_batch(cfg, bc, BATCH, 500)),
           bc, 500, 0)

    with open("BENCH_LONGSEQ.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
