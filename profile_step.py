"""Capture a jax.profiler trace of the flagship step on the TPU and print
the top device ops by total time.  Parses the Chrome-trace export
(vm.trace.json.gz) directly — the tensorboard_plugin_profile xplane
converter is broken against this image's TF/protobuf versions.
Diagnostic tool, not a bench."""

import collections
import glob
import gzip
import json
import sys


def summarize(trace_path: str, top: int = 30):
    with gzip.open(trace_path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    names = {e["pid"]: e["args"].get("name", "")
             for e in ev if e.get("ph") == "M"
             and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    steps = 0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in names.get(e.get("pid"), ""):
            continue
        dur[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        if e["name"].startswith("jit_"):
            steps += 1
    steps = max(steps, 1)
    print(f"{steps} steps captured; per-step totals:")
    for n, d in dur.most_common(top):
        print(f"{d / steps / 1e3:9.3f} ms  x{cnt[n] // steps:<3d} {n[:90]}")


def main():
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
    step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    batch = _batch(cfg, bert_cfg, b=32, s=128)
    rng = jax.random.PRNGKey(0)

    for _ in range(5):
        state, m = step(state, batch, rng)
    float(m["loss"])

    logdir = "/tmp/prof_step"
    with jax.profiler.trace(logdir):
        for _ in range(10):
            state, m = step(state, batch, rng)
        float(m["loss"])

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print(json.dumps({"error": "no trace captured"}))
        return
    summarize(files[-1])


if __name__ == "__main__":
    if len(sys.argv) > 1:       # summarize an existing capture
        summarize(sys.argv[1])
    else:
        main()
