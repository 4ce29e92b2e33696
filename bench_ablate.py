"""Component-cost ablation of the flagship train step (profiling aid).

Times the full flagship step, then variants with one component toggled,
so optimization effort goes where the milliseconds are.  Prints one JSON
line per variant and writes BENCH_ABLATE.json.  Not a driver artifact —
a development tool (the driver bench stays bench.py).

Run on TPU: `python bench_ablate.py` (each variant is its own XLA program;
remote-compile misses take 10-20 min per shape).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

WARMUP = 3
MEASURE = 10
B, S = 32, 128


def _batch(cfg, bert_cfg, b, s):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, bert_cfg.vocab_size, (b, s)), jnp.int32),
        "input_mask": jnp.ones((b, s), jnp.int32),
        "segment_ids": jnp.zeros((b, s), jnp.int32),
        "label_ids": jnp.asarray(
            rng.randint(1, cfg.num_crf_labels, (b, s)), jnp.int32),
        "imagelabel": jnp.asarray(
            rng.dirichlet(np.ones(cfg.num_anp_classes), size=b), jnp.float32),
    }
    if cfg.use_prefix:
        c = cfg.resnet_concat_channels
        batch["main_guides"] = jnp.asarray(rng.randn(b, 4, c), jnp.float32)
        batch["aux_guides"] = jnp.asarray(rng.randn(b, 3, 4, c), jnp.float32)
    return batch


def _time_step(cfg, bert_cfg, attention_impl=None):
    import jax

    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    impl = attention_impl or select_attention_impl(cfg, True)
    loss_fn = make_crf_loss_fn(cfg, bert_cfg, impl)
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    batch = _batch(cfg, bert_cfg, B, S)

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    float(metrics["loss"])     # force completion through the axon tunnel
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return dt / MEASURE * 1e3   # ms/step


def main():
    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.core.platform import configure_tpu_defaults
    from mtvaf_tpu.nn.bert import BertConfig, xla_attention
    configure_tpu_defaults()

    flagship = dict(dataset_name="twitter2015", use_prefix=True, use_152=True,
                    vao=True, use_probe=True)
    bc = BertConfig.base()
    rows = []

    def record(name, ms):
        row = {"variant": name, "ms_per_step": round(ms, 3),
               "examples_per_s": round(B / ms * 1e3, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    base_cfg = Config(**flagship)
    base = _time_step(base_cfg, bc)
    record("full_flagship", base)

    # attention: XLA lowering instead of the Pallas kernel
    record("attn_xla", _time_step(base_cfg, bc, attention_impl=xla_attention))

    # attention-prob dropout off (isolates the in-kernel PRNG cost)
    record("no_attn_dropout",
           _time_step(Config(**flagship), dataclasses.replace(
               bc, attention_probs_dropout_prob=0.0)))

    # probe loss off
    record("no_probe", _time_step(Config(**{**flagship, "use_probe": False}),
                                  bc))

    # ANP (vao) losses off
    record("no_vao", _time_step(Config(**{**flagship, "vao": False}), bc))

    # visual prefix off (text-only CRF)
    record("no_prefix", _time_step(
        Config(**{**flagship, "use_prefix": False, "use_152": False,
                  "vao": False}), bc))

    with open("BENCH_ABLATE.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
