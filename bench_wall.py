"""Production train-loop WALL-CLOCK bench (full pipeline, not just the step).

Round-2's ingest ladder (BASELINE.md: 87-114 → 540 ex/s) was measured with
an ad-hoc script; this makes it a repeatable artifact.  Builds the flagship
CRF config on synthetic data with real JPEG images (ResNet-152 guides
computed once per image via GuideCache, device-resident table on),
runs `CrfTrainer.train()` for a few epochs, and reports the best
steady-state epoch throughput — the number that includes batch packing,
guide gathering, prefetch, dispatch, and train-metric collection.

Run on TPU: `python bench_wall.py` (first epoch pays compiles and guide
fills; steady state is epochs 2+).  Writes BENCH_WALL.json.
"""

from __future__ import annotations

import json
import logging
import os
import tempfile

N_EXAMPLES = 2048
N_IMAGES = 64
EPOCHS = 4


def _run_and_report(trainer, logger_name: str, metric: str, config_str: str,
                    outfile: str, smoke: bool):
    """Run trainer.train() sampling per-epoch throughput at each epoch-end
    log record; report best steady-state epoch (epoch 1 pays compiles)."""
    rates = []

    class _Hook(logging.Handler):
        def emit(self, record):
            if "train loss" in record.getMessage():
                rates.append(trainer.last_throughput)

    hook = _Hook()
    logging.getLogger(logger_name).addHandler(hook)
    trainer.train()
    logging.getLogger(logger_name).removeHandler(hook)

    steady = max(rates[1:]) if len(rates) > 1 else (rates or [0.0])[-1]
    row = {"metric": metric, "value": round(steady, 1),
           "unit": "examples/s",
           "per_epoch": [round(r, 1) for r in rates],
           "config": config_str}
    print(json.dumps(row))
    if not smoke:
        with open(outfile, "w") as f:
            json.dump(row, f, indent=2)


def _stage_decomposition(cfg, ds, trainer):
    """Where does the production step's wall time go?  The host and the
    device share ONE core through a ~25-40 ms/RPC tunnel, so the loop's
    throughput is bounded by max(host CPU per batch, device step) plus
    coupling losses.  Times three things over one epoch of batches:

    * ``host_ms``   — the prefetch generator alone (batch slicing, guide
      gather dispatch, pack, upload, unpack dispatch), no training;
    * ``step_ms``   — the train step alone on ONE staged batch (device
      ceiling, pipelined dispatches);
    * ``loop_ms``   — the real combined loop (trainer.train()-equivalent
      path without metric collection), one epoch.
    """
    import time

    import jax
    import numpy as np

    from mtvaf_tpu.data.datasets import iterate_batches

    accum = cfg.gradient_accumulation_steps

    def gen():
        for b in iterate_batches(ds.arrays, cfg.train_batch_size,
                                 shuffle=True, seed=cfg.seed, epoch=2):
            b = trainer._attach_guides(b, ds, accum=accum)
            yield trainer._device_batch(b, accum, mesh=trainer.mesh)

    # warm epoch: compiles + guide-table fills
    last = None
    for dev in gen():
        last = dev
    rng = jax.random.PRNGKey(0)
    state, m = trainer.train_step(trainer.state, dev, rng)
    float(np.asarray(m["loss"]))

    out = {}
    t0 = time.perf_counter()
    n = 0
    for dev in gen():
        n += 1
    # force completion with a host fetch — block_until_ready can return
    # early through the axon tunnel (CLAUDE.md)
    float(np.asarray(jax.tree.leaves(dev)[0]).ravel()[0])
    out["host_ms"] = round((time.perf_counter() - t0) / n * 1e3, 2)

    t0 = time.perf_counter()
    for _ in range(n):
        state, m = trainer.train_step(state, last, rng)
    float(np.asarray(m["loss"]))
    out["step_ms"] = round((time.perf_counter() - t0) / n * 1e3, 2)

    from mtvaf_tpu.data.datasets import prefetch
    t0 = time.perf_counter()
    for dev in prefetch(gen()):
        state, m = trainer.train_step(state, dev, rng)
    float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / n
    out["loop_ms"] = round(dt * 1e3, 2)
    out["loop_ex_s"] = round(cfg.train_batch_size / dt, 1)
    print(json.dumps(out))


def main_span(smoke: bool = False):
    """Span-pipeline production wall: twitter15 + prefix + probe through
    SpanTrainer.train() — full host path incl. train-metric collection
    (eval_absa) and the gold-candidate precompute in the data layer."""
    global N_EXAMPLES, N_IMAGES, EPOCHS
    if smoke:
        N_EXAMPLES, N_IMAGES, EPOCHS = 32, 4, 2
        import jax
        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)
    from mtvaf_tpu.core.platform import configure_tpu_defaults
    if not smoke:
        configure_tpu_defaults()

    import dataclasses

    import jax

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.datasets import SpanDataset
    from mtvaf_tpu.data.synthetic import (make_images, make_span_file,
                                          make_vocab_file)
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_span_model_params
    from mtvaf_tpu.nn.resnet import init_resnet_params
    from mtvaf_tpu.train.trainer_span import SpanTrainer

    with tempfile.TemporaryDirectory() as d:
        img_ids = [f"{800000 + i}.jpg" for i in range(N_IMAGES)]
        make_images(os.path.join(d, "imgs"), img_ids, size=256)
        make_span_file(os.path.join(d, "train.txt"), N_EXAMPLES, seed=0,
                       image_ids=img_ids)
        make_vocab_file(os.path.join(d, "vocab.txt"))
        tok = FullTokenizer(os.path.join(d, "vocab.txt"))

        cfg = Config(dataset_name="twitter15", use_prefix=True,
                     use_152=True, use_probe=True, num_epochs=EPOCHS,
                     eval_begin_epoch=99,
                     cache_dir=os.path.join(d, "cache"))
        if smoke:
            cfg = cfg.replace(use_152=False, use_18=True, max_seq=24,
                              train_batch_size=8, eval_batch_size=8,
                              mesh_data=1, use_probe=False)
            bc = BertConfig.tiny(vocab_size=len(tok.vocab))
        else:
            bc = dataclasses.replace(BertConfig.base(),
                                     vocab_size=max(len(tok.vocab), 128))
        ds = SpanDataset.load(cfg, tok, os.path.join(d, "train.txt"),
                              img_dir=os.path.join(d, "imgs"))
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bc)
        resnet = init_resnet_params(jax.random.PRNGKey(1),
                                    depth=cfg.resnet_depth)

        trainer = SpanTrainer(cfg, bc, params, train_dataset=ds,
                              dev_dataset=ds, test_dataset=ds,
                              resnet_params=resnet,
                              attention_impl=select_attention_impl(cfg, True))
        _run_and_report(trainer, "mtvaf_tpu.train.trainer_span",
                        "production_wall_span_examples_per_sec",
                        "span twitter15 + prefix + probe, b32 s128,"
                        " JPEG→guides→step + train eval_absa",
                        "BENCH_WALL_SPAN.json", smoke)


def main(smoke: bool = False, stages: bool = False):
    global N_EXAMPLES, N_IMAGES, EPOCHS
    if smoke:        # CPU smoke test of the harness itself (tiny scale)
        N_EXAMPLES, N_IMAGES, EPOCHS = 32, 4, 2
        import jax
        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)
    from mtvaf_tpu.core.platform import configure_tpu_defaults
    if not smoke:
        configure_tpu_defaults()

    import jax

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.datasets import CrfDataset
    from mtvaf_tpu.data.synthetic import (make_crf_files, make_images,
                                          make_vocab_file)
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.nn.resnet import init_resnet_params
    from mtvaf_tpu.train.trainer_crf import CrfTrainer

    with tempfile.TemporaryDirectory() as d:
        img_ids = [f"{700000 + i}.jpg" for i in range(N_IMAGES)]
        make_images(os.path.join(d, "imgs"), img_ids, size=256)
        make_crf_files(os.path.join(d, "train.txt"),
                       os.path.join(d, "anp.json"), N_EXAMPLES, seed=0,
                       image_ids=img_ids, num_anp=16 if smoke else 2089)
        make_vocab_file(os.path.join(d, "vocab.txt"))
        tok = FullTokenizer(os.path.join(d, "vocab.txt"))

        import dataclasses
        cfg = Config(dataset_name="twitter2015", use_prefix=True,
                     use_152=True, vao=True, use_probe=True,
                     num_epochs=EPOCHS, eval_begin_epoch=99,
                     num_anp_classes=2089,
                     cache_dir=os.path.join(d, "cache"))
        if smoke:
            cfg = cfg.replace(use_152=False, use_18=True, max_seq=24,
                              train_batch_size=8, eval_batch_size=8,
                              num_anp_classes=16, mesh_data=1)
            bc = BertConfig.tiny(vocab_size=len(tok.vocab))
        else:
            bc = dataclasses.replace(BertConfig.base(),
                                     vocab_size=max(len(tok.vocab), 128))
        ds = CrfDataset.load(cfg, tok, os.path.join(d, "train.txt"),
                             os.path.join(d, "anp.json"),
                             img_dir=os.path.join(d, "imgs"))
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
        resnet = init_resnet_params(jax.random.PRNGKey(1),
                                    depth=cfg.resnet_depth)

        trainer = CrfTrainer(cfg, bc, params, train_dataset=ds,
                             dev_dataset=ds, test_dataset=ds,
                             resnet_params=resnet,
                             attention_impl=select_attention_impl(cfg, True))

        if stages:
            _stage_decomposition(cfg, ds, trainer)
            return

        _run_and_report(trainer, "mtvaf_tpu.train.trainer_crf",
                        "production_wall_examples_per_sec",
                        "flagship CRF, b32 s128, JPEG→guides→fused step,"
                        " device guide table + packed upload",
                        "BENCH_WALL.json", smoke)


if __name__ == "__main__":
    import sys
    if "--span" in sys.argv:
        main_span(smoke="--smoke" in sys.argv)
    else:
        main(smoke="--smoke" in sys.argv, stages="--stages" in sys.argv)
