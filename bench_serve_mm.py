"""Online MULTIMODAL serving bench (TPU): BatchingServer under closed-loop
load with one image per request (the online shape — aux crop zeros are
created on device, so a b16 batch uploads 16 main images only).

Drives the c3 model family (BERT-base + visual prefix, ResNet-152) through
the online tier at fp32, fp16 and uint8 image transfer.  On tunneled
backends the rows are upload-bound (~9.6 / ~4.8 / ~2.4 MB per b16 batch);
on directly attached hosts the same path is PCIe-bound and far faster —
the rows document the transfer scaling, not a device limit.

Writes BENCH_SERVE_MM.json.
"""

from __future__ import annotations

import json
import os
import tempfile

BATCH_SHAPES = (1, 16)
CONCURRENCY = (1, 32)


def main():
    import numpy as np

    from mtvaf_tpu.core.platform import configure_tpu_defaults
    configure_tpu_defaults()

    import jax

    import bench_serve
    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.synthetic import make_vocab_file
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.infer import CrfPredictor
    from mtvaf_tpu.kernels.prefix_attention import select_attention_impl
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.nn.resnet import init_resnet_params
    from mtvaf_tpu.serve import BatchingServer

    cfg = Config(dataset_name="twitter2017", use_prefix=True, use_152=True)
    with tempfile.TemporaryDirectory() as d:
        make_vocab_file(os.path.join(d, "vocab.txt"))
        tok = FullTokenizer(os.path.join(d, "vocab.txt"))
        bc = BertConfig(vocab_size=max(len(tok.vocab), 128))
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
        resnet = init_resnet_params(jax.random.PRNGKey(1),
                                    depth=cfg.resnet_depth)
        rng = np.random.RandomState(0)
        words = [w for w in tok.vocab if w.isalpha()][:200] or ["food"]
        pool = [" ".join(rng.choice(words, size=12)) for _ in range(256)]
        # one shared image row per request slot (pre-generated: clients
        # run concurrently and RandomState is not thread-safe)
        image = rng.rand(224, 224, 3).astype(np.float32)

        out = {}
        for dtype in ("float32", "float16", "uint8"):
            predictor = CrfPredictor(
                cfg, bc, params, tok, resnet_params=resnet,
                attention_impl=select_attention_impl(cfg, False),
                image_dtype=dtype)
            rows = bench_serve._drive(
                BatchingServer, predictor, pool, concurrency=CONCURRENCY,
                batch_shapes=BATCH_SHAPES, image=image,
                requests_per_client=24)
            out[dtype] = rows

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SERVE_MM.json")
    with open(path, "w") as f:
        json.dump({"config": "online BatchingServer, c3 prefix CRF "
                             f"(ResNet-152), one image/request, shapes "
                             f"{list(BATCH_SHAPES)}, no-aux fused dispatch",
                   "rows_fp32": out["float32"],
                   "rows_fp16": out["float16"],
                   "rows_u8": out["uint8"]}, f, indent=1)
    print(json.dumps({"metric": "online_mm_serving_peak_sentences_per_sec",
                      "value": max(r["sentences_per_sec"]
                                   for r in out["uint8"]),
                      "unit": "sentences/s"}))


if __name__ == "__main__":
    main()
