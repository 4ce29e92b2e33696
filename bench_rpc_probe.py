"""Probe the tunnel RPC structure of one serving request (TPU).

Times each host<->device interaction of a single CrfPredictor.predict so the
serve.py latency work attacks the right component:
  a) 5 separate jnp.asarray uploads (the current _make_batch)
  b) one packed upload (train/ingest.pack_and_put, unpack jitted)
  c) the decode dispatch alone (inputs already resident)
  d) one pooled 3-array fetch
  e) end-to-end predict() at b=1..64 compiled shapes
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


def t(fn, n=20):
    fn()                      # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import numpy as np

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    import jax
    import jax.numpy as jnp

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.synthetic import make_vocab_file
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.infer import CrfPredictor
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.train.ingest import pack_and_put

    cfg = Config(dataset_name="twitter2015")
    with tempfile.TemporaryDirectory() as d:
        make_vocab_file(os.path.join(d, "vocab.txt"))
        tok = FullTokenizer(os.path.join(d, "vocab.txt"))
        bc = BertConfig(vocab_size=max(len(tok.vocab), 128))
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
        pred = CrfPredictor(cfg, bc, params, tok,
                            attention_impl=select_attention_impl(cfg, False))

        B, S = 16, cfg.max_seq
        rng = np.random.RandomState(0)
        host = {
            "input_ids": rng.randint(0, bc.vocab_size, (B, S)).astype(np.int32),
            "input_mask": np.ones((B, S), np.int32),
            "segment_ids": np.zeros((B, S), np.int32),
            "label_ids": rng.randint(0, 10, (B, S)).astype(np.int32),
            "imagelabel": np.zeros((B, cfg.num_anp_classes), np.float32),
        }

        def upload_separate():
            arrs = [jnp.asarray(v) for v in host.values()]
            jax.block_until_ready(arrs)
            float(arrs[0][0, 0])        # force through the tunnel

        def upload_packed():
            out = pack_and_put(dict(host))
            jax.block_until_ready(list(out.values()))
            float(out["input_ids"][0, 0])

        dev = pack_and_put(dict(host))
        dev = {k: v for k, v in dev.items()}

        def dispatch_only():
            out = pred._decode(pred.params, dev)
            float(out["loss"])

        out = pred._decode(pred.params, dev)

        def fetch_pooled():
            jax.device_get((dev["label_ids"], dev["input_mask"],
                            out["pred_tags"]))

        def fetch_single():
            np.asarray(out["pred_tags"])

        sents = ["the food was great but the service was slow"] * B

        def tok_only():
            pred._make_batch(sents, None, None)

        print(json.dumps({"tokenize+upload_b16_ms": round(t(tok_only), 2)}),
              flush=True)
        print(json.dumps({"upload_5sep_ms": round(t(upload_separate), 2)}),
              flush=True)
        print(json.dumps({"upload_packed_ms": round(t(upload_packed), 2)}),
              flush=True)
        print(json.dumps({"dispatch_fetchloss_ms": round(t(dispatch_only), 2)}),
              flush=True)
        print(json.dumps({"fetch_pooled_ms": round(t(fetch_pooled), 2)}),
              flush=True)
        print(json.dumps({"fetch_single_ms": round(t(fetch_single), 2)}),
              flush=True)

        for b in (1, 4, 16, 64):
            ss = sents[:1] * b
            pred.predict(ss)          # compile this shape
            ms = t(lambda: pred.predict(ss), n=10)
            print(json.dumps({f"predict_b{b}_ms": round(ms, 2),
                              f"predict_b{b}_sps": round(b / ms * 1e3, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
