"""Capture a jax.profiler trace of the flagship step on the TPU and dump
the top ops by self time (via tensorboard_plugin_profile's xplane parse).
Diagnostic tool, not a bench."""

import glob
import json
import sys


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

    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, file=sys.stderr)
    if not files:
        print(json.dumps({"error": "no xplane captured"}))
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    out = data if isinstance(data, (str, bytes)) else json.dumps(data)
    with open("/tmp/prof_step/op_profile.json", "w") as f:
        f.write(out if isinstance(out, str) else out.decode())
    print("wrote /tmp/prof_step/op_profile.json")


if __name__ == "__main__":
    main()
