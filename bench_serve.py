"""Online serving bench (TPU): BatchingServer under closed-loop load.

Drives the dynamic-batching server (mtvaf_tpu/serve.py) with K concurrent
synchronous clients over the production text CRF predictor (the
c6_crf_serving model shape: BERT-base, b16 s128) and reports sustained
sentences/s plus p50/p95 request latency per concurrency level.

What it shows: at K=1 the request pays one wait window + one device call
(latency floor); as K grows the queue coalesces into full 16-row batches
and the dispatch/collect pipeline (depth 4) overlaps each batch's ~25-40 ms
tunnel fetch with the next batches' compute — throughput should approach
the offline predict_many rate (BENCH_CONFIGS c6).

Writes BENCH_SERVE.json (one row per K) and prints it.  A second block
("span_rows") drives the SpanPredictor through the same server at the
ladder's two ends (idle latency, saturated throughput) — its collect path
runs the host candidate/NMS seam plus a second device stage per batch.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time

BATCH_SHAPES = (1, 4, 16, 64)      # ladder: idle b1, saturated b64
PIPELINE_DEPTH = 4
MAX_WAIT_MS = 5.0
REQUESTS_PER_CLIENT = 60
CONCURRENCY = (1, 8, 32, 64, 128, 256)


def main():
    import numpy as np

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    import jax

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.synthetic import make_vocab_file
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.infer import CrfPredictor
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.serve import BatchingServer

    cfg = Config(dataset_name="twitter2015")
    with tempfile.TemporaryDirectory() as d:
        make_vocab_file(os.path.join(d, "vocab.txt"))
        tok = FullTokenizer(os.path.join(d, "vocab.txt"))
        bc = BertConfig(vocab_size=max(len(tok.vocab), 128))
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
        predictor = CrfPredictor(cfg, bc, params, tok,
                                 attention_impl=select_attention_impl(
                                     cfg, False))
        rng = np.random.RandomState(0)
        words = [w for w in tok.vocab if w.isalpha()][:200] or ["food"]
        # pre-generate on the main thread: RandomState is not thread-safe
        # and clients run concurrently
        pool = [" ".join(rng.choice(words, size=12)) for _ in range(512)]

        rows = _drive(BatchingServer, predictor, pool)

        # Span pipeline through the same online tier: dispatch covers the
        # extraction program; collect runs the host candidate/NMS seam +
        # the classification program (two device stages per batch, so the
        # saturated rate sits below the CRF row by design).  Measured at
        # the two ends of the ladder: idle latency + saturated throughput.
        from mtvaf_tpu.infer import SpanPredictor
        from mtvaf_tpu.nn.models import init_span_model_params
        span_cfg = Config(dataset_name="twitter15")
        span_params = init_span_model_params(jax.random.PRNGKey(0),
                                             span_cfg, bc)
        span_predictor = SpanPredictor(
            span_cfg, bc, span_params, tok,
            attention_impl=select_attention_impl(span_cfg, False))
        span_rows = _drive(BatchingServer, span_predictor, pool,
                           concurrency=(1, 128))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SERVE.json"), "w") as f:
        json.dump({"config": "online BatchingServer, text CRF BERT-base "
                             f"shapes {list(BATCH_SHAPES)} s{cfg.max_seq}, "
                             f"pipeline depth {PIPELINE_DEPTH}, max_wait "
                             f"{MAX_WAIT_MS} ms, packed one-RPC dispatch, "
                             "hold-partials fill policy (partial_inflight "
                             "default)",
                   "rows": rows,
                   "span_rows": span_rows}, f, indent=1)
    print(json.dumps({"metric": "online_serving_peak_sentences_per_sec",
                      "value": max(r["sentences_per_sec"] for r in rows),
                      "unit": "sentences/s"}))


def _drive(BatchingServer, predictor, pool, concurrency=CONCURRENCY,
           batch_shapes=BATCH_SHAPES, image=None,
           requests_per_client=REQUESTS_PER_CLIENT):
    """Closed-loop clients against one server config; one row per K.
    ``image``: optional per-request image row (multimodal serving —
    bench_serve_mm.py)."""

    def sentence(i):
        return pool[i % len(pool)]

    rows = []
    for k in concurrency:
        server = BatchingServer(predictor, max_wait_ms=MAX_WAIT_MS,
                                pipeline_depth=PIPELINE_DEPTH,
                                batch_shapes=batch_shapes)
        server.warmup()         # compile every rung before the clock
        n_req = requests_per_client * k
        errors = []

        def client(cid):
            try:
                for i in range(requests_per_client):
                    server.predict(sentence(cid * 1000 + i), image)
            except BaseException as e:     # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(k)]
        t0 = time.perf_counter()
        [t.start() for t in threads]
        [t.join() for t in threads]
        dt = time.perf_counter() - t0
        stats = server.stats()
        server.close()
        assert not errors, errors[0]
        assert stats["served"] == n_req
        rows.append({"concurrency": k, "sentences_per_sec":
                     round(n_req / dt, 1),
                     "p50_ms": stats["p50_ms"],
                     "p95_ms": stats["p95_ms"],
                     "mean_batch": stats["mean_batch"]})
        print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
