"""Probe: is the flagship step dispatch-bound through the tunneled backend?

Three measurements on the attached TPU chip:

* ``dispatch_floor`` — a trivial chained jitted fn enqueued N times then
  fetched once: the per-dispatch client+tunnel cost with ~zero compute.
* ``step_host_dispatch`` — the flagship train step driven exactly like
  bench.py (one host dispatch per step, fetch once at the end).
* ``step_scan_fused`` — the SAME step body iterated G times by a
  ``lax.scan`` inside ONE jitted program (one dispatch for G steps).

If scan-fused lands well under host-dispatch, the production loop is
dispatch-RPC-bound at small step times and a multi-step "superstep" is
worth wiring into the trainers.
"""

from __future__ import annotations

import json
import time

G = 50
REPEATS = 3


def _time_best(fn, repeats=REPEATS):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    from __graft_entry__ import _batch, _flagship
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.train.optim import build_optimizer
    from mtvaf_tpu.train.steps import (create_train_state, make_crf_loss_fn,
                                       make_train_step)

    out = {}

    # --- raw dispatch floor -------------------------------------------------
    tick = jax.jit(lambda x: x + 1.0)
    x = tick(jnp.zeros(()))
    float(x)

    def chain():
        y = x
        for _ in range(G):
            y = tick(y)
        float(y)

    chain()
    out["dispatch_floor_ms"] = round(_time_best(chain) / G * 1e3, 2)

    # --- flagship step, host-dispatched (bench.py pattern) ------------------
    cfg, bert_cfg, params = _flagship()
    optimizer, _ = build_optimizer(params, cfg, total_steps=1000,
                                   pipeline="crf")
    loss_fn = make_crf_loss_fn(cfg, bert_cfg,
                               attention_impl=select_attention_impl(cfg, True))
    train_step = make_train_step(loss_fn, optimizer)
    state = create_train_state(params, optimizer)
    batch = _batch(cfg, bert_cfg, b=32, s=128)
    rng = jax.random.PRNGKey(0)

    for _ in range(5):
        state, metrics = train_step(state, batch, rng)
    float(metrics["loss"])

    def host_loop():
        nonlocal state
        st = state
        for _ in range(G):
            st, m = train_step(st, batch, rng)
        float(m["loss"])
        state = st

    out["step_host_dispatch_ms"] = round(_time_best(host_loop) / G * 1e3, 2)

    # --- flagship step, scan-fused (one dispatch for G steps) ---------------
    # Rebuild an undonated step body: scan carries the state internally.
    inner = make_train_step(loss_fn, optimizer, donate=False)

    def scan_body(st, _):
        st, m = inner(st, batch, rng)
        return st, m["loss"]

    @jax.jit
    def fused(st):
        st, losses = jax.lax.scan(scan_body, st, None, length=G)
        return st, losses[-1]

    state2, last = fused(state)
    float(last)

    def fused_loop():
        nonlocal state2
        st, l = fused(state2)
        float(l)
        state2 = st

    out["step_scan_fused_ms"] = round(_time_best(fused_loop) / G * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
