"""Go/no-go probe for int8 quantized inference (measured dead end).

(a) chained matmul micro: bf16 vs W8A8 int8 vs weight-only-int8 MXU rate
    at encoder shapes (M = b64*s128; K = hidden / 2*hidden).  The chain
    feeds each matmul's output into the next (prevents loop hoisting) and
    includes the requant/rescale a real quantized layer pays.
(b) current bf16 CRF decode throughput at b64 (pipelined, offline) — the
    denominator: how much of a serving batch is device compute at all.

Result on v5e-1 (2026-08-19, docs/DESIGN.md §10): int8 only 1.26×/1.37×
bf16 (requant eats the nominal 2× MXU rate), weight-only neutral-to-worse,
and the b64 serving batch is ~2/3 tunnel-RPC + host work — int8 moves
end-to-end serving <10%.  Rejected; revisit only where serving is
compute-bound.
"""
import os, sys, time, tempfile

from mtvaf_tpu.core.platform import configure_tpu_defaults
configure_tpu_defaults()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("devices:", jax.devices(), flush=True)

DIMS = (((1,), (0,)), ((), ()))


def bench_chain_bf16(M, K, iters=200):
    b = jnp.asarray(np.random.randn(K, K) * 0.05, jnp.bfloat16)
    a0 = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(a, _):
            y = lax.dot_general(a, b, DIMS, preferred_element_type=jnp.float32)
            return (y * 0.05).astype(jnp.bfloat16), None
        a, _ = lax.scan(body, a, None, length=iters)
        return a.astype(jnp.float32).sum()

    float(run(a0))
    t0 = time.perf_counter(); v = float(run(a0)); t1 = time.perf_counter()
    per = (t1 - t0) / iters
    tflops = 2 * M * K * K / per / 1e12
    print(f"bf16 chain M={M} K={K}: {per*1e6:.1f} us/mm, {tflops:.1f} TFLOPs", flush=True)
    return per


def bench_chain_int8(M, K, iters=200):
    b = jnp.asarray(np.random.randint(-20, 20, (K, K)), jnp.int8)
    a0 = jnp.asarray(np.random.randint(-20, 20, (M, K)), jnp.int8)

    @jax.jit
    def run(a):
        def body(a, _):
            y = lax.dot_general(a, b, DIMS, preferred_element_type=jnp.int32)
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8), None
        a, _ = lax.scan(body, a, None, length=iters)
        return a.astype(jnp.int32).sum()

    int(run(a0))
    t0 = time.perf_counter(); v = int(run(a0)); t1 = time.perf_counter()
    per = (t1 - t0) / iters
    tops = 2 * M * K * K / per / 1e12
    print(f"int8 chain M={M} K={K}: {per*1e6:.1f} us/mm, {tops:.1f} TOPs", flush=True)
    return per


def bench_mixed_w8_abf16(M, K, iters=200):
    # weight-only int8: dequantize W to bf16 then bf16 matmul (bandwidth win only)
    b = jnp.asarray(np.random.randint(-20, 20, (K, K)), jnp.int8)
    scale = jnp.float32(0.01)
    a0 = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(a, _):
            bw = (b.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16))
            y = lax.dot_general(a, bw, DIMS, preferred_element_type=jnp.float32)
            return (y * 0.05).astype(jnp.bfloat16), None
        a, _ = lax.scan(body, a, None, length=iters)
        return a.astype(jnp.float32).sum()

    float(run(a0))
    t0 = time.perf_counter(); v = float(run(a0)); t1 = time.perf_counter()
    per = (t1 - t0) / iters
    print(f"w8/a-bf16 chain M={M} K={K}: {per*1e6:.1f} us/mm", flush=True)
    return per


M = 64 * 128
for K in (768, 1536):
    bench_chain_bf16(M, K)
    bench_chain_int8(M, K)
    bench_mixed_w8_abf16(M, K)

# (b) current decode throughput at b64
from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.synthetic import make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.infer import CrfPredictor
from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params

cfg = Config(dataset_name="twitter2015")
with tempfile.TemporaryDirectory() as d:
    make_vocab_file(os.path.join(d, "vocab.txt"))
    tok = FullTokenizer(os.path.join(d, "vocab.txt"))
    bc = BertConfig(vocab_size=max(len(tok.vocab), 128))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
    pred = CrfPredictor(cfg, bc, params, tok,
                        attention_impl=select_attention_impl(cfg, False))
    rng = np.random.RandomState(0)
    words = [w for w in tok.vocab if w.isalpha()][:200] or ["food"]
    sents = [" ".join(rng.choice(words, size=12)) for _ in range(64 * 24)]
    pred.predict_many(sents[:256], batch_size=64)          # warm
    # sync single-batch latency
    t0 = time.perf_counter(); pred.predict(sents[:64]); t1 = time.perf_counter()
    print(f"sync b64 predict latency: {(t1-t0)*1e3:.1f} ms", flush=True)
    t0 = time.perf_counter()
    out = pred.predict_many(sents, batch_size=64, window=4)
    t1 = time.perf_counter()
    n = len(sents)
    print(f"predict_many b64: {n/(t1-t0):.0f} sentences/s "
          f"({(t1-t0)/ (n//64) *1e3:.1f} ms/batch)", flush=True)
